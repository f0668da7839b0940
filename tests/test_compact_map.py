"""Compact query view (ops/compact_map.py) vs the sparse hash map: the view
must answer the 27-voxel NN query bit-identically, since registration swaps
one for the other per frame."""

import numpy as np
import jax.numpy as jnp
import pytest

from kiss_icp_tpu.ops import compact_map as cmod
from kiss_icp_tpu.ops import hash_map as hm


def _build_map(storage="f32", n_frames=3, seed=0, capacity_log2=12):
    rng = np.random.default_rng(seed)
    cfg = hm.MapConfig(
        voxel_size=1.0, max_distance=30.0, max_points_per_voxel=5,
        capacity_log2=capacity_log2, probe_length=16, group_capacity=8,
        storage=storage,
    )
    m = hm.create_map(cfg)
    for _ in range(n_frames):
        pts = rng.uniform(-12.0, 12.0, size=(600, 3)).astype(np.float32)
        m, _ = hm.insert(cfg, m, jnp.asarray(pts), jnp.ones((600,), bool))
    return cfg, m


@pytest.mark.parametrize("storage", ["f32", "u16"])
def test_query_parity_exact(storage):
    cfg, m = _build_map(storage)
    ccfg = cmod.CompactConfig(live_capacity_log2=12, hash_capacity_log2=14,
                              probe_length=8)
    cm = cmod.build_compact(cfg, ccfg, m)
    assert int(cm.num_dropped) == 0
    assert int(cm.n_live) == int(np.sum(np.asarray(m.counts) > 0))

    rng = np.random.default_rng(1)
    q = rng.uniform(-14.0, 14.0, size=(512, 3)).astype(np.float32)
    valid = np.ones((512,), bool)
    valid[500:] = False
    ref = hm.query_nearest(cfg, m, jnp.asarray(q), jnp.asarray(valid))
    got = cmod.query_nearest_compact(cfg, ccfg, cm, jnp.asarray(q),
                                     jnp.asarray(valid))

    np.testing.assert_array_equal(np.asarray(ref.found), np.asarray(got.found))
    f = np.asarray(ref.found)
    np.testing.assert_array_equal(np.asarray(ref.distances)[f],
                                  np.asarray(got.distances)[f])
    np.testing.assert_array_equal(np.asarray(ref.neighbors)[f],
                                  np.asarray(got.neighbors)[f])


def test_lookup_rows_roundtrip():
    cfg, m = _build_map()
    ccfg = cmod.CompactConfig(live_capacity_log2=12, hash_capacity_log2=14)
    cm = cmod.build_compact(cfg, ccfg, m)

    keys = np.asarray(cm.ckeys)[: int(cm.n_live)]
    row, found = cmod.lookup_rows(ccfg, cm, jnp.asarray(keys))
    assert bool(np.all(np.asarray(found)))
    np.testing.assert_array_equal(np.asarray(row), np.arange(len(keys)))

    # Absent voxels must not be found.
    absent = keys + np.array([1000, 1000, 1000], np.int32)
    _, found = cmod.lookup_rows(ccfg, cm, jnp.asarray(absent))
    assert not bool(np.any(np.asarray(found)))


def test_live_capacity_overflow_surfaces():
    cfg, m = _build_map()
    n_live = int(np.sum(np.asarray(m.counts) > 0))
    ccfg = cmod.CompactConfig(live_capacity_log2=8, hash_capacity_log2=10)
    assert n_live > ccfg.live_capacity  # the premise of the test
    cm = cmod.build_compact(cfg, ccfg, m)
    assert int(cm.num_dropped) == n_live - ccfg.live_capacity
    assert int(cm.n_live) == ccfg.live_capacity


def test_trim_then_rebuild():
    cfg, m = _build_map()
    m = hm.trim(cfg, m, jnp.asarray([11.0, 11.0, 11.0], jnp.float32))
    ccfg = cmod.CompactConfig(live_capacity_log2=12, hash_capacity_log2=14)
    cm = cmod.build_compact(cfg, ccfg, m)
    assert int(cm.n_live) == int(np.sum(np.asarray(m.counts) > 0))

    rng = np.random.default_rng(2)
    q = rng.uniform(-14.0, 14.0, size=(256, 3)).astype(np.float32)
    valid = np.ones((256,), bool)
    ref = hm.query_nearest(cfg, m, jnp.asarray(q), jnp.asarray(valid))
    got = cmod.query_nearest_compact(cfg, ccfg, cm, jnp.asarray(q),
                                     jnp.asarray(valid))
    f = np.asarray(ref.found)
    np.testing.assert_array_equal(f, np.asarray(got.found))
    np.testing.assert_array_equal(np.asarray(ref.distances)[f],
                                  np.asarray(got.distances)[f])


def test_overflow_falls_back_to_sparse_query():
    """CompactConfig docstring contract: when live voxels exceed the compact
    view's capacity, registration falls back to the full sparse-map query
    (lax.cond in align_points_to_map) — the pose must match nn_mode="gather27"
    to f32 ulp level (the cond changes the XLA program, so fused arithmetic
    can round differently; the NN answers themselves are bit-identical, see
    the parity tests above), with the overflow still surfaced via the drop
    counter."""
    from kiss_icp_tpu.ops import registration, se3

    cfg, m = _build_map()
    n_live = int(np.sum(np.asarray(m.counts) > 0))
    assert n_live > (1 << 8)

    rng = np.random.default_rng(3)
    q = rng.uniform(-10.0, 10.0, size=(256, 3)).astype(np.float32)
    valid = np.ones((256,), bool)
    guess = np.asarray(se3.identity()).copy()
    guess[:3, 3] = [0.05, -0.03, 0.02]

    kwargs = dict(
        points=jnp.asarray(q), valid=jnp.asarray(valid),
        initial_guess=jnp.asarray(guess),
        max_distance=jnp.asarray(1.5, jnp.float32),
        kernel_scale=jnp.asarray(0.5, jnp.float32),
        max_iterations=20, convergence=1e-4,
    )
    ref = registration.align_points_to_map(cfg, m, nn_mode="gather27", **kwargs)
    got = registration.align_points_to_map(
        cfg, m, nn_mode="compact", nn_live_capacity_log2=8, **kwargs
    )
    assert int(got.num_dropped_compact) == n_live - (1 << 8)
    np.testing.assert_allclose(np.asarray(ref.pose), np.asarray(got.pose),
                               atol=1e-6)
    assert int(ref.num_iterations) == int(got.num_iterations)

    # And with ample capacity the compact path itself is used (no drops).
    ok = registration.align_points_to_map(
        cfg, m, nn_mode="compact", nn_live_capacity_log2=12, **kwargs
    )
    assert int(ok.num_dropped_compact) == 0
    np.testing.assert_allclose(np.asarray(ref.pose), np.asarray(ok.pose),
                               atol=1e-6)
