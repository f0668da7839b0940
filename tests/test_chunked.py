"""Chunked (lax.scan) multi-frame step tests."""

import jax
import numpy as np

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 2048
    cfg.engine.frame_capacity = 2048
    cfg.engine.source_capacity = 512
    cfg.engine.map_capacity_log2 = 13
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 15
    return cfg


def _frames(k, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts = np.stack([base + np.array([0.2 * i, 0, 0], np.float32) for i in range(k)])
    ts = np.zeros((k, n), np.float32)
    valid = np.ones((k, n), bool)
    return pts, ts, valid


def test_chunked_matches_streaming():
    cfg = _config()
    k, n = 4, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(k, n)

    chunk = odometry.make_chunked_step(cfg)
    state_c = odometry.init_state(cfg)
    state_c, summary = chunk(state_c, pts, ts, valid)
    assert summary.poses.shape == (k, 4, 4)

    step = odometry.make_step(cfg)
    state_s = odometry.init_state(cfg)
    stream_poses = []
    for i in range(k):
        state_s, res = step(state_s, pts[i], ts[i], valid[i])
        stream_poses.append(np.asarray(res.pose))

    np.testing.assert_allclose(
        np.asarray(summary.poses), np.stack(stream_poses), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_c.pose), np.asarray(state_s.pose), atol=1e-5
    )


def test_chunked_summary_fields():
    cfg = _config()
    k, n = 3, cfg.engine.max_points_per_frame
    pts, ts, valid = _frames(k, n, seed=1)
    chunk = odometry.make_chunked_step(cfg)
    state, summary = chunk(odometry.init_state(cfg), pts, ts, valid)
    assert summary.sigmas.shape == (k,)
    assert summary.num_iterations.shape == (k,)
    assert summary.num_correspondences.shape == (k,)
    assert np.all(np.isfinite(np.asarray(summary.poses)))
