"""End-to-end odometry tests on synthetic sequences."""

import numpy as np
import jax.numpy as jnp

import oracle
from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu import odometry


def _world():
    """A synthetic corridor world: floor + two side walls with texture bumps."""
    rng = np.random.default_rng(0)
    n = 60000
    x = rng.uniform(-10, 110, n)
    which = rng.integers(0, 3, n)
    y = np.where(which == 0, -8.0, np.where(which == 1, 8.0, rng.uniform(-8, 8, n)))
    z = np.where(which == 2, 0.0, rng.uniform(0, 5, n))
    pts = np.stack([x, y, z], axis=1)
    # Texture so the corridor direction is observable.
    pts += 0.3 * np.sin(pts[:, [0]] * 1.7) * np.sign(pts[:, [1]])
    return pts.astype(np.float64)


def _scan_from(world, pose, max_range=50.0, n_keep=8000, seed=0):
    """Points visible from `pose`, expressed in the body frame."""
    rng = np.random.default_rng(seed)
    inv = np.linalg.inv(pose)
    body = world @ inv[:3, :3].T + inv[:3, 3]
    r = np.linalg.norm(body, axis=1)
    vis = np.where((r < max_range) & (r > 1.0))[0]
    sel = rng.choice(vis, size=min(n_keep, len(vis)), replace=False)
    return body[sel].astype(np.float32)


def _trajectory(n_frames, step=1.0):
    poses = []
    pose = np.eye(4)
    for i in range(n_frames):
        poses.append(pose.copy())
        yaw = 0.004 * np.sin(i * 0.3)
        delta = oracle.se3_exp(np.array([step, 0.02 * np.sin(i * 0.5), 0, 0, 0, yaw]))
        pose = pose @ delta
    return poses


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.data.deskew = False
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 16384
    cfg.engine.frame_capacity = 16384
    cfg.engine.source_capacity = 4096
    cfg.engine.map_capacity_log2 = 17
    return cfg


def test_odometry_tracks_synthetic_trajectory():
    world = _world()
    gt = _trajectory(12)
    icp = odometry.KissICP(_config())
    est = []
    for i, pose in enumerate(gt):
        scan = _scan_from(world, pose, seed=i)
        icp.register_frame(scan)
        est.append(icp.last_pose)

    # First frame seeds the map at identity.
    np.testing.assert_allclose(est[0], np.eye(4), atol=1e-5)
    # Trajectory error stays small (constant-velocity model is violated at
    # start, so allow a modest bound).
    for e, g in zip(est[2:], gt[2:]):
        trans_err = np.linalg.norm(e[:3, 3] - g[:3, 3])
        assert trans_err < 0.15, trans_err


def test_first_frame_registers_against_empty_map():
    icp = odometry.KissICP(_config())
    scan = np.random.default_rng(1).uniform(-20, 20, (1000, 3)).astype(np.float32)
    icp.register_frame(scan)
    np.testing.assert_allclose(icp.last_pose, np.eye(4), atol=1e-6)
    assert icp.local_map_points().shape[0] > 0


def test_returns_frame_and_source():
    icp = odometry.KissICP(_config())
    rng = np.random.default_rng(2)
    scan = rng.uniform(-40, 40, (5000, 3)).astype(np.float32)
    frame, source = icp.register_frame(scan)
    # Frame is range-cropped; source is the double-downsampled subset.
    assert 0 < len(source) < len(frame) <= 5000
    r = np.linalg.norm(frame, axis=1)
    assert np.all((r > 1.0) & (r < 50.0))


def test_fixed_threshold_config():
    cfg = _config()
    cfg.adaptive_threshold.fixed_threshold = 0.3
    icp = odometry.KissICP(cfg)
    scan = np.random.default_rng(3).uniform(-20, 20, (2000, 3)).astype(np.float32)
    icp.register_frame(scan)
    icp.register_frame(scan)
    assert float(icp.last_result.sigma) == np.float32(0.3)


def test_oversized_frame_is_subsampled():
    cfg = _config()
    cfg.engine.max_points_per_frame = 2048
    icp = odometry.KissICP(cfg)
    scan = np.random.default_rng(4).uniform(-20, 20, (10000, 3)).astype(np.float32)
    frame, _ = icp.register_frame(scan)
    assert len(frame) <= 2048
