"""rclpy-free ROS node core: parameter mapping, base-frame re-expression via
a (fake) TF lookup, TF payload construction/inversion.

Covers the logic the reference only exercises inside a ROS container
(OdometryServer.cpp:105-217), including the TF2 extrinsic lookup path that
round 1 stubbed with identity.
"""

import numpy as np
from scipy.spatial.transform import Rotation

from kiss_icp_tpu.ros import core


def _pose(yaw=0.3, t=(5.0, -2.0, 0.5)):
    p = np.eye(4)
    p[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
    p[:3, 3] = t
    return p


def _extrinsic():
    e = np.eye(4)
    e[:3, :3] = Rotation.from_euler("xyz", [0.05, -0.02, 1.2]).as_matrix()
    e[:3, 3] = (0.8, 0.0, -1.5)
    return e


def test_config_from_params_defaults():
    cfg = core.config_from_params({})
    assert cfg.data.max_range == 100.0
    assert cfg.mapping.voxel_size == 1.0  # derived max_range / 100
    assert cfg.adaptive_threshold.fixed_threshold is None
    assert cfg.registration.max_num_iterations == 500


def test_config_from_params_overrides():
    cfg = core.config_from_params(
        {"max_range": 50.0, "voxel_size": 0.5, "fixed_threshold": 0.3,
         "deskew": False}
    )
    assert cfg.data.max_range == 50.0
    assert cfg.mapping.voxel_size == 0.5
    assert cfg.adaptive_threshold.fixed_threshold == 0.3
    assert not cfg.data.deskew


def test_egocentric_no_base_frame():
    pub = core.OdometryPublisher(odom_frame="odom", base_frame="")
    pose = _pose()
    out = pub.build(pose, "lidar")
    np.testing.assert_allclose(out.pose, pose)
    assert out.frame_id == "odom"
    assert out.child_frame_id == "lidar"
    assert out.tf.parent_frame == "odom"
    assert out.tf.child_frame == "lidar"
    np.testing.assert_allclose(out.tf.pose, pose)


def test_base_frame_equals_cloud_frame_is_egocentric():
    calls = []
    pub = core.OdometryPublisher(
        base_frame="lidar", tf_lookup=lambda *a: calls.append(a) or np.eye(4)
    )
    out = pub.build(_pose(), "lidar")
    assert out.child_frame_id == "lidar"
    assert not calls  # no lookup performed (OdometryServer.cpp:179)


def test_base_frame_conjugation_through_tf():
    ext = _extrinsic()
    looked_up = []

    def lookup(target, source):
        looked_up.append((target, source))
        return ext

    pub = core.OdometryPublisher(base_frame="base_link", tf_lookup=lookup)
    pose = _pose()
    out = pub.build(pose, "lidar")
    # Reference: pose' = cloud2base * pose * cloud2base^-1
    # with cloud2base = LookupTransform(base_frame, cloud_frame).
    np.testing.assert_allclose(out.pose, ext @ pose @ np.linalg.inv(ext),
                               atol=1e-12)
    assert looked_up == [("base_link", "lidar")]
    assert out.child_frame_id == "base_link"
    assert pub.extrinsic_warning is None

    # Second build reuses the cached extrinsic: no new lookup.
    pub.build(pose, "lidar")
    assert len(looked_up) == 1


def test_missing_tf_falls_back_to_identity_with_warning():
    pub = core.OdometryPublisher(base_frame="base_link",
                                 tf_lookup=lambda *a: None)
    pose = _pose()
    out = pub.build(pose, "lidar")
    np.testing.assert_allclose(out.pose, pose)  # identity conjugation
    assert pub.extrinsic_warning is not None
    assert "base_link" in pub.extrinsic_warning


def test_inverted_tf():
    pub = core.OdometryPublisher(odom_frame="odom", invert_odom_tf=True)
    pose = _pose()
    out = pub.build(pose, "lidar")
    assert out.tf.parent_frame == "lidar"
    assert out.tf.child_frame == "odom"
    np.testing.assert_allclose(out.tf.pose, np.linalg.inv(pose), atol=1e-12)


def test_tf_disabled():
    pub = core.OdometryPublisher(publish_odom_tf=False)
    assert pub.build(_pose(), "lidar").tf is None


def test_transform_to_matrix_roundtrip():
    ext = _extrinsic()
    q = Rotation.from_matrix(ext[:3, :3]).as_quat()
    m = core.transform_to_matrix(ext[:3, 3], q)
    np.testing.assert_allclose(m, ext, atol=1e-12)


def test_publisher_from_params():
    cfg, pub = core.publisher_from_params(
        {"lidar_odom_frame": "map", "base_frame": "base", "invert_odom_tf": True,
         "position_covariance": 0.5}
    )
    assert pub.odom_frame == "map"
    assert pub.base_frame == "base"
    assert pub.invert_odom_tf
    assert pub.position_covariance == 0.5
    assert cfg.data.max_range == 100.0
    cov = pub.build(_pose(), "base").covariance
    assert cov[0, 0] == 0.5
