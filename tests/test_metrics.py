"""Trajectory metric tests (KITTI seq error, Umeyama ATE)."""

import numpy as np

import oracle
from kiss_icp_tpu import metrics


def _straight_trajectory(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_seq_error_zero_for_identical():
    gt = _straight_trajectory(1500)  # 1.5 km so all segment lengths fire
    t_err, r_err = metrics.seq_error(gt, gt.copy())
    assert t_err == 0.0 and r_err == 0.0


def test_seq_error_scale_drift():
    gt = _straight_trajectory(1200)
    est = _straight_trajectory(1200, step=1.01)  # 1% scale drift
    t_err, r_err = metrics.seq_error(gt, est)
    np.testing.assert_allclose(t_err, 1.0, rtol=0.05)  # ~1 % translational error
    assert r_err < 1e-6


def test_seq_error_short_trajectory_no_segments():
    gt = _straight_trajectory(50)  # < 100 m: no valid segment
    t_err, r_err = metrics.seq_error(gt, gt)
    assert t_err == 0.0 and r_err == 0.0


def test_ate_invariant_to_rigid_offset():
    rng = np.random.default_rng(0)
    gt = _straight_trajectory(200)
    # Estimate = GT expressed in a different world frame -> ATE should be ~0.
    offset = oracle.se3_exp(rng.standard_normal(6))
    est = np.einsum("ij,njk->nik", offset, gt)
    ate_rot, ate_trans = metrics.absolute_trajectory_error(gt, est)
    # Umeyama aligns translations; rotations keep the constant offset, which
    # does appear in ATE_rot unless the offset is a pure translation.
    assert ate_trans < 1e-6


def test_ate_detects_noise():
    rng = np.random.default_rng(1)
    gt = _straight_trajectory(300)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(0, 0.5, size=(300, 3))
    _, ate_trans = metrics.absolute_trajectory_error(gt, est)
    np.testing.assert_allclose(ate_trans, 0.5 * np.sqrt(3), rtol=0.2)
