"""Voxelization kernels vs. pure-numpy dict oracles."""

import numpy as np
import jax.numpy as jnp

from kiss_icp_tpu.ops import voxel


def _oracle_downsample(points, voxel_size):
    """First-point-wins in original order (reference VoxelUtils.cpp semantics
    with deterministic lowest-index iteration)."""
    grid = {}
    for p in points:
        key = tuple(np.floor(p / voxel_size).astype(np.int64))
        if key not in grid:
            grid[key] = p
    return np.array(list(grid.values())), grid


def test_point_to_voxel_floor_semantics():
    pts = jnp.asarray(
        np.array([[0.0, 0.49, 0.51], [-0.01, -0.5, -0.99], [1.0, -1.0, 2.49]], np.float32)
    )
    out = np.asarray(voxel.point_to_voxel(pts, 0.5))
    expected = np.floor(np.asarray(pts) / 0.5).astype(np.int32)
    np.testing.assert_array_equal(out, expected)


def test_pack_keys_lexicographic():
    rng = np.random.default_rng(0)
    coords = rng.integers(-2000, 2000, size=(256, 3)).astype(np.int32)
    hi, lo = voxel.pack_voxel_keys(jnp.asarray(coords), jnp.ones(256, bool))
    hi, lo = np.asarray(hi).astype(np.int64), np.asarray(lo).astype(np.int64)
    packed = hi * (1 << 17) + lo
    order_packed = np.lexsort((lo, hi))
    order_coords = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    np.testing.assert_array_equal(packed[order_packed], packed[order_coords])


def test_downsample_matches_oracle():
    rng = np.random.default_rng(1)
    pts = (rng.uniform(-50, 50, size=(1000, 3))).astype(np.float32)
    valid = np.ones(1000, bool)
    out = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), voxel_size=2.0, capacity=1024)
    got = np.asarray(out.points)[np.asarray(out.valid)]
    expected, _ = _oracle_downsample(pts, 2.0)
    assert int(out.num_kept) == len(expected)
    assert int(out.num_dropped) == 0
    # Same point sets (order may differ: ours is sorted by voxel key).
    got_set = {tuple(np.round(r, 5)) for r in got}
    exp_set = {tuple(np.round(r, 5)) for r in expected}
    assert got_set == exp_set


def test_downsample_first_index_wins():
    # Two points in the same voxel: the earlier one must survive.
    pts = np.array([[0.9, 0.9, 0.9], [0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
    out = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.ones(3, bool), voxel_size=1.0, capacity=8
    )
    kept = np.asarray(out.points)[np.asarray(out.valid)]
    assert kept.shape == (1, 3)
    np.testing.assert_allclose(kept[0], pts[0])


def test_downsample_respects_mask_and_capacity():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, size=(512, 3)).astype(np.float32)
    valid = np.zeros(512, bool)
    valid[:100] = True
    out = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), voxel_size=0.1, capacity=64)
    # 100 valid points in tiny voxels -> ~100 unique, capped at 64.
    assert int(out.num_kept) == 64
    assert int(out.num_dropped) > 0
    assert np.asarray(out.valid).sum() == 64
    expected, _ = _oracle_downsample(pts[:100], 0.1)
    got = np.asarray(out.points)[np.asarray(out.valid)]
    exp_set = {tuple(np.round(r, 5)) for r in expected}
    for row in got:
        assert tuple(np.round(row, 5)) in exp_set


def test_group_by_voxel_matches_oracle():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    valid[250:] = False
    g = voxel.group_by_voxel(
        jnp.asarray(pts), jnp.asarray(valid), voxel_size=4.0, group_capacity=16
    )
    # Oracle: dict voxel -> points in original order.
    groups = {}
    for p in pts[:250]:
        key = tuple(np.floor(p / 4.0).astype(np.int64))
        groups.setdefault(key, []).append(p)
    assert int(g.num_groups) == len(groups)
    coords = np.asarray(g.coords)
    cands = np.asarray(g.candidates)
    cvalid = np.asarray(g.cand_valid)
    gvalid = np.asarray(g.group_valid)
    for i in range(int(g.num_groups)):
        assert gvalid[i]
        key = tuple(coords[i].astype(np.int64))
        assert key in groups
        expected = np.array(groups[key][:16])
        got = cands[i][cvalid[i]]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=1e-6)
    assert not gvalid[int(g.num_groups):].any()


def test_group_by_voxel_overflow_drops_extras():
    # 20 points all in one voxel, group_capacity 8 -> first 8 by index kept.
    pts = np.linspace(0.1, 0.9, 60).reshape(20, 3).astype(np.float32)
    g = voxel.group_by_voxel(jnp.asarray(pts), jnp.ones(20, bool), voxel_size=5.0, group_capacity=8)
    assert int(g.num_groups) == 1
    got = np.asarray(g.candidates[0])[np.asarray(g.cand_valid[0])]
    np.testing.assert_allclose(got, pts[:8], atol=1e-6)


def test_standalone_voxel_down_sample_numpy_api():
    """Reference-compat utility (kiss_icp.voxelization.voxel_down_sample):
    numpy in/out, one point per voxel, lowest index wins."""
    from kiss_icp_tpu.voxelization import voxel_down_sample

    rng = np.random.default_rng(4)
    frame = rng.uniform(-10, 10, (777, 4)).astype(np.float32)  # extra column
    out = voxel_down_sample(frame, 1.0)
    assert out.shape[1] == 3 and 0 < len(out) <= 777
    keys_in = np.floor(frame[:, :3] / 1.0).astype(np.int64)
    keys_out = np.floor(out / 1.0).astype(np.int64)
    assert len({tuple(k) for k in keys_out}) == len(out)  # one per voxel
    assert {tuple(k) for k in keys_out} == {tuple(k) for k in keys_in}
    first = {}
    for i, kk in enumerate(map(tuple, keys_in)):
        first.setdefault(kk, frame[i, :3])
    for kk, p in zip(map(tuple, keys_out), out):
        np.testing.assert_array_equal(p, first[kk])
    assert len(voxel_down_sample(np.zeros((0, 3)), 1.0)) == 0


def test_sort_by_voxel_key_packed_matches_three_key_fallback():
    """The packed two-key sort (indices fit 17 bits) must order rows
    identically to the 3-key fallback used above 2^17 rows."""
    import jax.numpy as jnp

    from kiss_icp_tpu.ops.voxel import _sort_by_voxel_key, pack_voxel_keys

    rng = np.random.default_rng(7)
    n = 512
    coords = rng.integers(-5, 5, size=(n, 3)).astype(np.int32)
    valid = rng.random(n) > 0.3
    hi, lo = pack_voxel_keys(jnp.asarray(coords), jnp.asarray(valid))
    idx = jnp.arange(n, dtype=jnp.int32)

    packed = _sort_by_voxel_key(hi, lo, idx, n)  # n <= 2^17 -> packed path
    fallback = _sort_by_voxel_key(hi, lo, idx, (1 << 17) + 1)  # 3-key path
    for a, b, name in zip(packed, fallback, ("hi", "lo", "idx")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"{name} ordering diverged")
