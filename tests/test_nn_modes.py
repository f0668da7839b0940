"""The four data-association strategies (engine.nn_mode) are bit-identical:
same NN answers per query, same end-to-end trajectories."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kiss_icp_tpu import odometry
from kiss_icp_tpu.config.parser import load_config
from kiss_icp_tpu.ops import compact_map as cmod
from kiss_icp_tpu.ops import hash_map as hm

MODES = ["gather27", "loop27", "compact", "compact_loop"]


def _build_map(seed=0):
    rng = np.random.default_rng(seed)
    cfg = hm.MapConfig(voxel_size=1.0, max_distance=30.0, max_points_per_voxel=7,
                       capacity_log2=12, storage="f32")
    m = hm.create_map(cfg)
    for _ in range(3):
        pts = rng.uniform(-12.0, 12.0, size=(800, 3)).astype(np.float32)
        m, _ = hm.insert(cfg, m, jnp.asarray(pts), jnp.ones((800,), bool))
    return cfg, m


def test_query_variants_bit_identical():
    cfg, m = _build_map()
    ccfg = cmod.CompactConfig(live_capacity_log2=12, hash_capacity_log2=14)
    cm = cmod.build_compact(cfg, ccfg, m)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-14, 14, size=(512, 3)).astype(np.float32))
    valid = jnp.ones((512,), bool)

    ref = hm.query_nearest(cfg, m, q, valid)
    variants = {
        "loop27": hm.query_nearest_loop(cfg, m, q, valid),
        "compact": cmod.query_nearest_compact(cfg, ccfg, cm, q, valid),
        "compact_loop": cmod.query_nearest_compact_loop(cfg, ccfg, cm, q, valid),
    }
    f = np.asarray(ref.found)
    for name, got in variants.items():
        np.testing.assert_array_equal(f, np.asarray(got.found), err_msg=name)
        np.testing.assert_array_equal(np.asarray(ref.distances)[f],
                                      np.asarray(got.distances)[f], err_msg=name)
        np.testing.assert_array_equal(np.asarray(ref.neighbors)[f],
                                      np.asarray(got.neighbors)[f], err_msg=name)


def _drive(nn_mode, n_frames=6):
    cfg = load_config(None)
    cfg.data.min_range = 1.0
    cfg.engine.max_points_per_frame = 8192
    cfg.engine.frame_capacity = 8192
    cfg.engine.source_capacity = 2048
    cfg.engine.map_capacity_log2 = 15
    cfg.engine.nn_mode = nn_mode
    cfg.engine.nn_live_capacity_log2 = 13
    cfg.engine.use_pallas = False

    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    ds = SyntheticDataset(sequence=0, n_scans=n_frames, speed=1.0,
                          accel_frames=30, n_beams=16, n_azimuth=512)
    step = odometry.make_step(cfg)
    state = odometry.init_state(cfg)
    poses = []
    drops = 0
    for i in range(n_frames):
        p, t = ds[i]
        pts = np.zeros((8192, 3), np.float32)
        ts = np.zeros((8192,), np.float32)
        valid = np.zeros((8192,), bool)
        n = len(p)
        pts[:n], ts[:n], valid[:n] = p, t, True
        state, res = step(state, jnp.asarray(pts), jnp.asarray(ts),
                          jnp.asarray(valid))
        poses.append(np.asarray(res.pose))
        drops += int(res.num_dropped_map_voxels)
    return np.stack(poses), drops


def test_end_to_end_trajectories_identical():
    # Per-query NN answers are bit-identical across modes (test above); the
    # end-to-end poses differ only by XLA's f32 reduction-order freedom in the
    # (JTJ, JTr) einsum (different programs tile it differently), so the
    # trajectory comparison is allclose at f32-epsilon scale, not bit-equal.
    ref, drops = _drive("gather27")
    assert drops == 0
    for mode in MODES[1:]:
        got, drops = _drive(mode)
        assert drops == 0, mode
        np.testing.assert_allclose(ref, got, atol=1e-5, err_msg=mode)


def test_pallas_fused_trajectory_close():
    # pallas_fused distances agree only to ulp level (separate compilation
    # cannot pin FMA contraction), so its trajectory tolerance is looser.
    ref, _ = _drive("gather27")
    got, drops = _drive("pallas_fused")
    assert drops == 0
    np.testing.assert_allclose(ref, got, atol=2e-4)


def test_compact_overflow_reaches_frame_result():
    # live capacity of 2^6 is far below the scene's voxel count: the drop
    # counter must surface through FrameResult.num_dropped_map_voxels.
    cfg = load_config(None)
    cfg.data.min_range = 1.0
    cfg.engine.max_points_per_frame = 4096
    cfg.engine.frame_capacity = 4096
    cfg.engine.source_capacity = 1024
    cfg.engine.map_capacity_log2 = 14
    cfg.engine.nn_mode = "compact"
    cfg.engine.nn_live_capacity_log2 = 6
    cfg.engine.use_pallas = False

    from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

    ds = SyntheticDataset(sequence=0, n_scans=2, n_beams=8, n_azimuth=512)
    step = odometry.make_step(cfg)
    state = odometry.init_state(cfg)
    total = 0
    for i in range(2):
        p, t = ds[i]
        pts = np.zeros((4096, 3), np.float32)
        ts = np.zeros((4096,), np.float32)
        valid = np.zeros((4096,), bool)
        n = min(len(p), 4096)
        pts[:n], ts[:n], valid[:n] = p[:n], t[:n], True
        state, res = step(state, jnp.asarray(pts), jnp.asarray(ts),
                          jnp.asarray(valid))
        total += int(res.num_dropped_map_voxels)
    assert total > 0


def test_compact_view_counts_cross_round_fingerprint_shadow():
    """Two voxels with EQUAL 32-bit fingerprints (the brute-forced pair from
    test_hash_map.py) can coexist in the DENSE map via different dense
    windows, then collide in the same compact hash window. lookup_rows stops
    at the first fingerprint match, so packing both would make one
    permanently unfindable; build_compact must refuse the second as a
    COUNTED drop (which triggers registration's sparse fallback) instead of
    silently losing it."""
    import jax.numpy as jnp

    from kiss_icp_tpu.ops import compact_map as cm_mod
    from kiss_icp_tpu.ops import hash_map as hm

    a = jnp.asarray([[-3403, 1173, 2243]], jnp.int32)
    b = jnp.asarray([[2285, 3484, 3708]], jnp.int32)
    assert int(hm.fingerprint(a)[0]) == int(hm.fingerprint(b)[0])

    cfg = hm.MapConfig(voxel_size=1.0, max_distance=1e5,
                       max_points_per_voxel=4, capacity_log2=13,
                       probe_length=16, group_capacity=8)
    # Same probe geometry as the dense config where the pair shares a
    # window -> they share a compact window too.
    ccfg = cm_mod.CompactConfig(live_capacity_log2=11, hash_capacity_log2=13,
                                probe_length=16)
    assert int(cm_mod._hash_rows(a, ccfg)[0]) == int(cm_mod._hash_rows(b, ccfg)[0])

    # Fabricate a dense map holding BOTH voxels (legal when their DENSE
    # windows differ; build_compact only reads counts/vkeys/points).
    m = hm.create_map(cfg)
    vkeys = m.vkeys.at[10].set(a[0]).at[20].set(b[0])
    counts = m.counts.at[10].set(1).at[20].set(1)
    points = m.points.at[10, 0].set(jnp.asarray(a[0], m.points.dtype))
    points = points.at[20, 0].set(jnp.asarray(b[0], m.points.dtype))
    m = m._replace(vkeys=vkeys, counts=counts, points=points)

    cm = cm_mod.build_compact(cfg, ccfg, m)
    assert int(cm.n_live) == 2
    assert int(cm.num_dropped) == 1  # the shadowed voxel: refused, counted

    rows_a, found_a = cm_mod.lookup_rows(ccfg, cm, a)
    rows_b, found_b = cm_mod.lookup_rows(ccfg, cm, b)
    # Exactly one is findable, and it resolves to its own key (never the
    # other voxel's points).
    assert int(found_a[0]) + int(found_b[0]) == 1
    row, found = (rows_a, found_a) if bool(found_a[0]) else (rows_b, found_b)
    key = a if bool(found_a[0]) else b
    assert bool(jnp.all(cm.ckeys[row[0]] == key[0]))
