"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py)."""

import jax
import numpy as np

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry
from kiss_icp_tpu.parallel import batch as pbatch


def _tiny_config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 512
    cfg.engine.frame_capacity = 512
    cfg.engine.source_capacity = 128
    cfg.engine.map_capacity_log2 = 10
    cfg.engine.probe_length = 8
    cfg.engine.group_capacity = 8
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 10
    return cfg


def _scans(b, n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-30, 30, (b, n, 3)).astype(np.float32)
    ts = np.tile(np.linspace(0, 1, n, dtype=np.float32), (b, 1))
    valid = np.ones((b, n), bool)
    return pts, ts, valid


def test_mesh_creation():
    mesh = pbatch.make_mesh(8, pts_shards=2)
    assert mesh.shape == {"seq": 4, "pts": 2}


def test_batched_step_runs_sharded():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = pbatch.make_mesh(8, pts_shards=2)
    cfg = _tiny_config()
    b, n = 8, cfg.engine.max_points_per_frame
    step = pbatch.make_batched_step(cfg, mesh)
    state = jax.device_put(
        pbatch.init_batched_state(cfg, b), pbatch.batched_state_sharding(mesh)
    )
    pts, ts, valid = _scans(b, n)
    state, result = step(state, pts, ts, valid)
    poses = np.asarray(result.pose)
    assert poses.shape == (b, 4, 4)
    assert np.all(np.isfinite(poses))
    # First frame seeds each sequence's map at identity.
    np.testing.assert_allclose(poses, np.tile(np.eye(4), (b, 1, 1)), atol=1e-5)


def test_batched_matches_single_sequence():
    """Sharded batched execution must agree with the single-sequence step."""
    cfg = _tiny_config()
    mesh = pbatch.make_mesh(8, pts_shards=2)
    b, n = 8, cfg.engine.max_points_per_frame
    step = pbatch.make_batched_step(cfg, mesh)
    bstate = jax.device_put(
        pbatch.init_batched_state(cfg, b), pbatch.batched_state_sharding(mesh)
    )

    # Two frames: seed + a slightly shifted rescan per sequence.
    pts0, ts0, valid0 = _scans(b, n, seed=1)
    pts1 = pts0 + np.array([0.3, 0.0, 0.0], np.float32)

    bstate, _ = step(bstate, pts0, ts0, valid0)
    bstate, bres = step(bstate, pts1, ts0, valid0)

    sstate = odometry.init_state(cfg)
    sstep = jax.jit(lambda s, p, t, v: odometry.register_frame(cfg, s, p, t, v))
    sstate, _ = sstep(sstate, pts0[3], ts0[3], valid0[3])
    sstate, sres = sstep(sstate, pts1[3], ts0[3], valid0[3])

    np.testing.assert_allclose(
        np.asarray(bres.pose)[3], np.asarray(sres.pose), atol=5e-4
    )


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_state, result = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(result.pose)))


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batched_chunked_step():
    """B sequences x K frames in one execution matches per-frame batched."""
    cfg = _tiny_config()
    mesh = pbatch.make_mesh(8, pts_shards=2)
    b, n, k = 8, cfg.engine.max_points_per_frame, 3

    rng = np.random.default_rng(7)
    base = rng.uniform(-30, 30, (b, n, 3)).astype(np.float32)
    pts = np.stack(
        [base + np.array([0.2 * i, 0, 0], np.float32) for i in range(k)]
    )  # (K, B, N, 3)
    ts = np.zeros((k, b, n), np.float32)
    valid = np.ones((k, b, n), bool)

    chunked = pbatch.make_batched_chunked_step(cfg, mesh)
    cstate = jax.device_put(
        pbatch.init_batched_state(cfg, b), pbatch.batched_state_sharding(mesh)
    )
    cstate, poses = chunked(cstate, pts, ts, valid)
    assert poses.shape == (k, b, 4, 4)

    step = pbatch.make_batched_step(cfg, mesh)
    sstate = jax.device_put(
        pbatch.init_batched_state(cfg, b), pbatch.batched_state_sharding(mesh)
    )
    for i in range(k):
        sstate, res = step(sstate, pts[i], ts[i], valid[i])
    np.testing.assert_allclose(
        np.asarray(poses)[-1], np.asarray(res.pose), atol=1e-5
    )


def test_batched_chunked_seq_mode_map_matches_vmap():
    """seq_mode='map' (per-sequence private ICP trip counts, lax.map) is the
    same trajectory as the lockstep vmap formulation — the two differ only in
    how the sequence axis maps onto the device (see batch.py docstring)."""
    cfg = _tiny_config()
    b, n, k = 4, cfg.engine.max_points_per_frame, 3

    rng = np.random.default_rng(11)
    base = rng.uniform(-30, 30, (b, n, 3)).astype(np.float32)
    # Distinct per-sequence velocities so iteration counts diverge.
    pts = np.stack(
        [base + np.arange(1, b + 1)[:, None, None].astype(np.float32)
         * np.array([0.15 * i, 0.02 * i, 0], np.float32) for i in range(k)]
    )
    ts = np.zeros((k, b, n), np.float32)
    valid = np.ones((k, b, n), bool)

    vchunk = pbatch.make_batched_chunked_step(cfg, seq_mode="vmap")
    vstate = pbatch.init_batched_state(cfg, b)
    vstate, vposes = vchunk(vstate, pts, ts, valid)

    mchunk = pbatch.make_batched_chunked_step(cfg, seq_mode="map")
    mstate = pbatch.init_batched_state(cfg, b)
    mstate, mposes = mchunk(mstate, pts, ts, valid)

    assert np.asarray(mposes).shape == (k, b, 4, 4)
    np.testing.assert_allclose(np.asarray(mposes), np.asarray(vposes),
                               atol=1e-5)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="single-device"):
        pbatch.make_batched_chunked_step(cfg, pbatch.make_mesh(8),
                                         seq_mode="map")
