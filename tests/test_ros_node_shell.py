"""Drive the rclpy OdometryServer shell against a faithful fake rclpy.

ros/core.py (all decision logic) is unit-tested rclpy-free, but the ~170-line
rclpy shell in ros/odometry_server.py had never executed against ANY rclpy —
the same "plausible code, unverifiable binding" gap the round-3 review called
out for the visualizer (fixed by tests/test_visualizer_gui.py's fake
polyscope). These fakes mirror the exact API surface the shell touches:
rclpy.node.Node (declare_parameter/get_parameter/create_publisher/
create_subscription/get_logger/destroy_node), rclpy.qos, rclpy.time.Time,
nav_msgs/geometry_msgs/sensor_msgs message classes with their real nested
structure and PointField datatype codes, and tf2_ros
Buffer/TransformListener/TransformBroadcaster.
"""

import sys
import types

import numpy as np
import pytest

from kiss_icp_tpu.datasets.synthetic import SyntheticDataset
from kiss_icp_tpu.ros import core, odometry_server


# ---------------------------------------------------------------- fake msgs
class _Time:
    def __init__(self):
        self.sec = 0
        self.nanosec = 0


class Header:
    def __init__(self):
        self.stamp = _Time()
        self.frame_id = ""


class _XYZ:
    def __init__(self):
        self.x = self.y = self.z = 0.0


class _Quat:
    def __init__(self):
        self.x = self.y = self.z = 0.0
        self.w = 1.0


class _Pose:
    def __init__(self):
        self.position = _XYZ()
        self.orientation = _Quat()


class _PoseWithCov:
    def __init__(self):
        self.pose = _Pose()
        self.covariance = [0.0] * 36


class Odometry:
    def __init__(self):
        self.header = Header()
        self.child_frame_id = ""
        self.pose = _PoseWithCov()


class _Transform:
    def __init__(self):
        self.translation = _XYZ()
        self.rotation = _Quat()


class TransformStamped:
    def __init__(self):
        self.header = Header()
        self.child_frame_id = ""
        self.transform = _Transform()


class PointField:
    INT8, UINT8, INT16, UINT16, INT32, UINT32, FLOAT32, FLOAT64 = range(1, 9)

    def __init__(self, name="", offset=0, datatype=7, count=1):
        self.name, self.offset, self.datatype, self.count = (
            name, offset, datatype, count)


class PointCloud2:
    def __init__(self):
        self.header = Header()
        self.height = self.width = 0
        self.fields = []
        self.is_bigendian = False
        self.point_step = self.row_step = 0
        self.data = b""
        self.is_dense = False


# ---------------------------------------------------------------- fake rclpy
class _Logger:
    def __init__(self):
        self.infos, self.warnings = [], []

    def info(self, m):
        self.infos.append(m)

    def warning(self, m):
        self.warnings.append(m)


class _Param:
    def __init__(self, value):
        self.value = value


class _FakePublisher:
    def __init__(self, topic):
        self.topic = topic
        self.msgs = []

    def publish(self, msg):
        self.msgs.append(msg)


class _FakeNode:
    """Mirrors the rclpy.node.Node surface OdometryServer uses."""

    PARAM_OVERRIDES = {}

    def __init__(self, node_name):
        self.node_name = node_name
        self._params = {}
        self.publishers = []
        self.subscriptions = []
        self._logger = _Logger()
        self.destroyed = False

    def declare_parameter(self, name, default):
        self._params[name] = self.PARAM_OVERRIDES.get(name, default)

    def get_parameter(self, name):
        return _Param(self._params[name])

    def create_publisher(self, msg_type, topic, qos):
        pub = _FakePublisher(topic)
        self.publishers.append(pub)
        return pub

    def create_subscription(self, msg_type, topic, callback, qos):
        self.subscriptions.append((topic, callback))
        return (topic, callback)

    def get_logger(self):
        return self._logger

    def destroy_node(self):
        self.destroyed = True


class _Buffer:
    def __init__(self):
        self.transforms = {}  # (target, source) -> TransformStamped

    def lookup_transform(self, target, source, time):
        try:
            return self.transforms[(target, source)]
        except KeyError:
            raise LookupError(f"no transform {target}<-{source}")


class _TransformListener:
    def __init__(self, buffer, node):
        self.buffer, self.node = buffer, node


class _TransformBroadcaster:
    def __init__(self, node):
        self.sent = []

    def sendTransform(self, tfm):
        self.sent.append(tfm)


def _fake_modules():
    rclpy = types.ModuleType("rclpy")
    rclpy.init = lambda args=None: None
    rclpy.shutdown = lambda: None
    rclpy.spin = lambda node: None

    node_mod = types.ModuleType("rclpy.node")
    node_mod.Node = _FakeNode
    qos_mod = types.ModuleType("rclpy.qos")

    class QoSProfile:
        def __init__(self, depth, reliability, durability):
            self.depth, self.reliability, self.durability = (
                depth, reliability, durability)

    class QoSReliabilityPolicy:
        RELIABLE = 1
        BEST_EFFORT = 2

    class QoSDurabilityPolicy:
        VOLATILE = 1
        TRANSIENT_LOCAL = 2

    qos_mod.QoSProfile = QoSProfile
    qos_mod.QoSReliabilityPolicy = QoSReliabilityPolicy
    qos_mod.QoSDurabilityPolicy = QoSDurabilityPolicy
    time_mod = types.ModuleType("rclpy.time")
    time_mod.Time = _Time
    exec_mod = types.ModuleType("rclpy.executors")

    class MultiThreadedExecutor:
        def __init__(self):
            self.nodes = []
            self.spun = False

        def add_node(self, node):
            self.nodes.append(node)

        def spin(self):
            self.spun = True

    exec_mod.MultiThreadedExecutor = MultiThreadedExecutor
    rclpy.node = node_mod
    rclpy.qos = qos_mod
    rclpy.time = time_mod
    rclpy.executors = exec_mod

    geometry = types.ModuleType("geometry_msgs")
    geometry_msg = types.ModuleType("geometry_msgs.msg")
    geometry_msg.TransformStamped = TransformStamped
    nav = types.ModuleType("nav_msgs")
    nav_msg = types.ModuleType("nav_msgs.msg")
    nav_msg.Odometry = Odometry
    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.PointCloud2 = PointCloud2
    sensor_msg.PointField = PointField

    tf2 = types.ModuleType("tf2_ros")
    tf2.TransformBroadcaster = _TransformBroadcaster
    tf2_buffer = types.ModuleType("tf2_ros.buffer")
    tf2_buffer.Buffer = _Buffer
    tf2_listener = types.ModuleType("tf2_ros.transform_listener")
    tf2_listener.TransformListener = _TransformListener
    tf2.buffer = tf2_buffer
    tf2.transform_listener = tf2_listener

    return {
        "rclpy": rclpy, "rclpy.node": node_mod, "rclpy.qos": qos_mod,
        "rclpy.time": time_mod, "rclpy.executors": exec_mod,
        "geometry_msgs": geometry, "geometry_msgs.msg": geometry_msg,
        "nav_msgs": nav, "nav_msgs.msg": nav_msg,
        "sensor_msgs": sensor, "sensor_msgs.msg": sensor_msg,
        "tf2_ros": tf2, "tf2_ros.buffer": tf2_buffer,
        "tf2_ros.transform_listener": tf2_listener,
    }


@pytest.fixture
def ros_env(monkeypatch):
    """Install the fake ROS modules, shrink the engine, reset the node-class
    cache; everything restored on teardown."""
    for name, mod in _fake_modules().items():
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setattr(odometry_server, "_NODE_CLASS", None)
    monkeypatch.setattr(_FakeNode, "PARAM_OVERRIDES", {})

    orig = core.config_from_params

    def small(params):
        cfg = orig(params)
        cfg.engine.max_points_per_frame = 8192
        cfg.engine.frame_capacity = 4096
        cfg.engine.source_capacity = 1024
        cfg.engine.map_capacity_log2 = 15
        cfg.engine.donate_state = False
        cfg.registration.max_num_iterations = 30
        return cfg

    monkeypatch.setattr(core, "config_from_params", small)
    yield


def _cloud_msg(points, frame_id="lidar", with_stamps=False):
    """A real-layout PointCloud2 (x,y,z[,t] float32) the pure-numpy decoder
    in tools/point_cloud2.py parses."""
    points = np.asarray(points, np.float32)
    n = len(points)
    msg = PointCloud2()
    msg.header.frame_id = frame_id
    msg.height, msg.width = 1, n
    names = ["x", "y", "z"] + (["t"] if with_stamps else [])
    msg.fields = [
        PointField(name=nm, offset=4 * i, datatype=PointField.FLOAT32)
        for i, nm in enumerate(names)
    ]
    msg.point_step = 4 * len(names)
    msg.row_step = msg.point_step * n
    if with_stamps:
        t = np.linspace(0.0, 1.0, n, dtype=np.float32)[:, None]
        rec = np.hstack([points, t])
    else:
        rec = points
    msg.data = np.ascontiguousarray(rec, np.float32).tobytes()
    msg.is_dense = True
    return msg


def _scan_frames(n=3):
    ds = SyntheticDataset(sequence=1, n_scans=n, n_beams=16, n_azimuth=128,
                          max_range=50.0)
    return [ds[i][0] for i in range(n)]


def _make_node(overrides):
    _FakeNode.PARAM_OVERRIDES.update(
        {"max_range": 50.0, "min_range": 1.0, "voxel_size": 0.5, **overrides})
    return odometry_server.get_node_class()()


def test_node_stream_publishes_odometry_tf_and_debug_clouds(ros_env):
    node = _make_node({"pointcloud_topic": "/points",
                       "publish_debug_clouds": True})
    assert node.node_name == "kiss_icp_tpu_node"
    (topic, callback), = node.subscriptions
    assert topic == "/points"
    assert "ready" in node.get_logger().infos[-1]

    for pts in _scan_frames(3):
        callback(_cloud_msg(pts, with_stamps=True))

    odom_pub = next(p for p in node.publishers if p.topic == "kiss/odometry")
    assert len(odom_pub.msgs) == 3
    last = odom_pub.msgs[-1]
    pos = (last.pose.pose.position.x, last.pose.pose.position.y,
           last.pose.pose.position.z)
    assert np.all(np.isfinite(pos))
    assert len(last.pose.covariance) == 36
    assert last.header.frame_id == "odom_lidar"
    assert last.child_frame_id == "lidar"  # cloud frame (no base_frame)

    # TF broadcast per frame, parent=odom, child=cloud frame
    assert len(node.tf_broadcaster.sent) == 3
    tfm = node.tf_broadcaster.sent[-1]
    assert tfm.header.frame_id == "odom_lidar"
    assert tfm.child_frame_id == "lidar"
    assert np.isclose(
        np.linalg.norm([tfm.transform.rotation.x, tfm.transform.rotation.y,
                        tfm.transform.rotation.z, tfm.transform.rotation.w]),
        1.0, atol=1e-5)

    # Debug clouds: frame/keypoints in the cloud frame, map in the odom frame
    frame_pub = next(p for p in node.publishers if p.topic == "kiss/frame")
    kp_pub = next(p for p in node.publishers if p.topic == "kiss/keypoints")
    map_pub = next(p for p in node.publishers if p.topic == "kiss/local_map")
    assert len(frame_pub.msgs) == len(kp_pub.msgs) == len(map_pub.msgs) == 3
    cloud = map_pub.msgs[-1]
    assert cloud.header.frame_id == "odom_lidar"
    assert cloud.width > 0 and cloud.point_step == 12
    assert len(cloud.data) == cloud.row_step


def test_node_inverted_tf(ros_env):
    node = _make_node({"invert_odom_tf": True})
    (_, callback), = node.subscriptions
    callback(_cloud_msg(_scan_frames(1)[0]))
    tfm = node.tf_broadcaster.sent[-1]
    assert tfm.header.frame_id == "lidar"
    assert tfm.child_frame_id == "odom_lidar"


def test_node_base_frame_retries_lookup_and_conjugates_when_tf_appears(ros_env):
    """While the base<-cloud TF is missing the node warns on EVERY frame
    (the reference's per-callback RCLCPP_WARN) and publishes unconjugated;
    once the TF appears it is cached and the child frame flips to base."""
    node = _make_node({"base_frame": "base_link"})
    (_, callback), = node.subscriptions
    frames = _scan_frames(3)
    callback(_cloud_msg(frames[0]))
    assert len(node.get_logger().warnings) == 1  # missing TF surfaced loudly
    callback(_cloud_msg(frames[1]))
    assert len(node.get_logger().warnings) == 2  # ...per frame, like the ref

    t = TransformStamped()
    t.transform.translation.x = 0.5  # base <- cloud extrinsic arrives
    node.tf_buffer.transforms[("base_link", "lidar")] = t
    callback(_cloud_msg(frames[2]))
    assert len(node.get_logger().warnings) == 2  # no new warning
    tfm = node.tf_broadcaster.sent[-1]
    assert tfm.child_frame_id == "base_link"


def test_main_saves_checkpoint_on_shutdown(ros_env, tmp_path):
    ckpt = tmp_path / "state.npz"
    _FakeNode.PARAM_OVERRIDES.update(
        {"max_range": 50.0, "min_range": 1.0, "voxel_size": 0.5,
         "save_checkpoint_path": str(ckpt)})
    odometry_server.main(args=None)  # fake spin returns immediately
    assert ckpt.exists()

    # A fresh node warm-starts from it without error.
    node = _make_node({"load_checkpoint": str(ckpt)})
    assert any("warm-started" in m for m in node.get_logger().infos)


class _ExtraNode(_FakeNode):
    def __init__(self):
        super().__init__("extra_node")


def _extra_node_factory():
    return _ExtraNode()


def test_container_composes_nodes_on_one_executor(ros_env, tmp_path):
    """container.main: odometry node + an extra factory-spec node on one
    (fake) MultiThreadedExecutor, checkpoint saved and nodes destroyed on
    shutdown — the rclpy analog of the reference's component container."""
    from kiss_icp_tpu.ros import container

    ckpt = tmp_path / "composed.npz"
    _FakeNode.PARAM_OVERRIDES.update(
        {"max_range": 50.0, "min_range": 1.0, "voxel_size": 0.5,
         "save_checkpoint_path": str(ckpt)})
    container.main(["test_ros_node_shell:_extra_node_factory"])
    assert ckpt.exists()  # spin returned -> finally saved + destroyed
