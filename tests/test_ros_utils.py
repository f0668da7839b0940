"""ROS node helper-geometry tests (no rclpy needed)."""

import numpy as np

import oracle
from kiss_icp_tpu.ros import utils


def test_pose_quat_roundtrip():
    rng = np.random.default_rng(0)
    pose = oracle.se3_exp(rng.standard_normal(6))
    q, t = utils.pose_to_quat_trans(pose)
    back = utils.quat_trans_to_pose(q, t)
    np.testing.assert_allclose(back, pose, atol=1e-9)


def test_reexpress_in_base_frame():
    rng = np.random.default_rng(1)
    pose = oracle.se3_exp(rng.standard_normal(6) * 0.5)
    t_cb = oracle.se3_exp(rng.standard_normal(6) * 0.2)
    out = utils.reexpress_in_base_frame(pose, t_cb)
    np.testing.assert_allclose(out, t_cb @ pose @ np.linalg.inv(t_cb), atol=1e-12)
    # identity extrinsics -> unchanged
    np.testing.assert_allclose(
        utils.reexpress_in_base_frame(pose, np.eye(4)), pose, atol=1e-12
    )


def test_odometry_covariance():
    cov = utils.odometry_covariance(0.2, 0.3)
    assert cov.shape == (6, 6)
    np.testing.assert_allclose(np.diag(cov), [0.2, 0.2, 0.2, 0.3, 0.3, 0.3])
    assert np.all(cov == cov.T)
