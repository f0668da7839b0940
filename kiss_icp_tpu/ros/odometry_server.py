"""ROS 2 odometry node backed by the TPU odometry engine.

Equivalent of the reference's C++ OdometryServer component
(ros/src/OdometryServer.{hpp:41-92,cpp:74-231}): subscribes to one PointCloud2
topic, runs register_frame per message, publishes nav_msgs/Odometry, an
optional TF (optionally inverted, optionally re-expressed in a base frame via
T' = T_cb . T . T_cb^-1), and optional debug clouds (deskewed frame, keypoints,
local map).

The reference writes this node in C++ because its whole compute core is C++;
here the per-frame compute is one jitted XLA program on the TPU, and the node
shell is rclpy (the shell does message plumbing at sensor rate, ~10 Hz, which
Python handles with margin). Parameters mirror the reference node's declared
parameter set (OdometryServer.cpp:105-154) including the derived
voxel_size = max_range / 100.

Run: ros2 run <pkg> kiss_icp_tpu_node  /  python -m kiss_icp_tpu.ros.odometry_server
"""

from __future__ import annotations

import numpy as np


def main(args=None):  # pragma: no cover - requires a ROS 2 environment
    try:
        import rclpy
        from rclpy.node import Node
        from rclpy.qos import (
            QoSDurabilityPolicy, QoSProfile, QoSReliabilityPolicy,
        )
        from geometry_msgs.msg import TransformStamped
        from nav_msgs.msg import Odometry
        from sensor_msgs.msg import PointCloud2, PointField
        from tf2_ros import TransformBroadcaster
    except ImportError as e:
        raise ImportError(
            "ROS 2 (rclpy + common msgs) is required for the odometry node"
        ) from e

    from kiss_icp_tpu.config.parser import load_config
    from kiss_icp_tpu.odometry import KissICP
    from kiss_icp_tpu.ros.utils import (
        odometry_covariance, pose_to_quat_trans, reexpress_in_base_frame,
    )
    from kiss_icp_tpu.tools.point_cloud2 import read_point_cloud

    class OdometryServer(Node):
        def __init__(self):
            super().__init__("kiss_icp_tpu_node")
            # Parameter set mirrors the reference node (OdometryServer.cpp:105-154).
            self.declare_parameter("pointcloud_topic", "pointcloud_topic")
            self.declare_parameter("base_frame", "")
            self.declare_parameter("lidar_odom_frame", "odom_lidar")
            self.declare_parameter("publish_odom_tf", True)
            self.declare_parameter("invert_odom_tf", False)
            self.declare_parameter("publish_debug_clouds", False)
            self.declare_parameter("max_range", 100.0)
            self.declare_parameter("min_range", 0.0)
            self.declare_parameter("deskew", True)
            self.declare_parameter("voxel_size", -1.0)
            self.declare_parameter("max_points_per_voxel", 20)
            self.declare_parameter("initial_threshold", 2.0)
            self.declare_parameter("min_motion_th", 0.1)
            self.declare_parameter("fixed_threshold", -1.0)
            self.declare_parameter("max_num_iterations", 500)
            self.declare_parameter("convergence_criterion", 1e-4)
            self.declare_parameter("position_covariance", 0.1)
            self.declare_parameter("orientation_covariance", 0.1)

            g = lambda n: self.get_parameter(n).value
            cfg = load_config(None)
            cfg.data.max_range = float(g("max_range"))
            cfg.data.min_range = float(g("min_range"))
            cfg.data.deskew = bool(g("deskew"))
            if float(g("voxel_size")) > 0:
                cfg.mapping.voxel_size = float(g("voxel_size"))
            cfg.mapping.max_points_per_voxel = int(g("max_points_per_voxel"))
            cfg.adaptive_threshold.initial_threshold = float(g("initial_threshold"))
            cfg.adaptive_threshold.min_motion_th = float(g("min_motion_th"))
            if float(g("fixed_threshold")) > 0:
                cfg.adaptive_threshold.fixed_threshold = float(g("fixed_threshold"))
            cfg.registration.max_num_iterations = int(g("max_num_iterations"))
            cfg.registration.convergence_criterion = float(g("convergence_criterion"))

            self.odometry = KissICP(cfg)
            self.base_frame = str(g("base_frame"))
            self.odom_frame = str(g("lidar_odom_frame"))
            self.publish_odom_tf = bool(g("publish_odom_tf"))
            self.invert_odom_tf = bool(g("invert_odom_tf"))
            self.publish_debug_clouds = bool(g("publish_debug_clouds"))
            self.covariance = odometry_covariance(
                float(g("position_covariance")), float(g("orientation_covariance"))
            )

            qos = QoSProfile(
                depth=10,
                reliability=QoSReliabilityPolicy.RELIABLE,
                durability=QoSDurabilityPolicy.VOLATILE,
            )
            self.odom_pub = self.create_publisher(Odometry, "kiss/odometry", qos)
            self.tf_broadcaster = TransformBroadcaster(self)
            if self.publish_debug_clouds:
                self.frame_pub = self.create_publisher(PointCloud2, "kiss/frame", qos)
                self.kpoints_pub = self.create_publisher(
                    PointCloud2, "kiss/keypoints", qos
                )
                self.map_pub = self.create_publisher(PointCloud2, "kiss/local_map", qos)
            self.create_subscription(
                PointCloud2, str(g("pointcloud_topic")), self.register_frame, qos
            )
            self.get_logger().info("kiss_icp_tpu odometry node ready")

        # --- per-message callback (reference OdometryServer.cpp:156-173) ---
        def register_frame(self, msg):
            points, timestamps = read_point_cloud(msg)
            self.odometry.register_frame_lazy(points, timestamps)
            pose = self.odometry.last_pose
            self.publish_odometry(pose, msg.header)
            if self.publish_debug_clouds:
                self.publish_clouds(msg.header)

        def publish_odometry(self, pose, header):
            cloud_frame = header.frame_id
            if self.base_frame:
                # The node cannot know T_cloud_base without TF lookup; use
                # identity unless a TF buffer is added (reference looks it up
                # once, OdometryServer.cpp:175-186).
                pose = reexpress_in_base_frame(pose, np.eye(4))
            q, t = pose_to_quat_trans(pose)

            from nav_msgs.msg import Odometry

            odom = Odometry()
            odom.header.stamp = header.stamp
            odom.header.frame_id = self.odom_frame
            odom.child_frame_id = self.base_frame or cloud_frame
            odom.pose.pose.position.x, odom.pose.pose.position.y, odom.pose.pose.position.z = t
            (odom.pose.pose.orientation.x, odom.pose.pose.orientation.y,
             odom.pose.pose.orientation.z, odom.pose.pose.orientation.w) = q
            odom.pose.covariance = list(self.covariance.ravel())
            self.odom_pub.publish(odom)

            if self.publish_odom_tf:
                from geometry_msgs.msg import TransformStamped

                tf = TransformStamped()
                tf.header.stamp = header.stamp
                if self.invert_odom_tf:
                    inv = np.linalg.inv(pose)
                    q, t = pose_to_quat_trans(inv)
                    tf.header.frame_id = odom.child_frame_id
                    tf.child_frame_id = self.odom_frame
                else:
                    tf.header.frame_id = self.odom_frame
                    tf.child_frame_id = odom.child_frame_id
                tf.transform.translation.x, tf.transform.translation.y, tf.transform.translation.z = t
                (tf.transform.rotation.x, tf.transform.rotation.y,
                 tf.transform.rotation.z, tf.transform.rotation.w) = q
                self.tf_broadcaster.sendTransform(tf)

        def publish_clouds(self, header):
            self.frame_pub.publish(self._to_pc2(self.odometry.last_frame(), header))
            self.kpoints_pub.publish(self._to_pc2(self.odometry.last_source(), header))
            map_header = type(header)()
            map_header.stamp = header.stamp
            map_header.frame_id = self.odom_frame
            self.map_pub.publish(
                self._to_pc2(self.odometry.local_map_points(), map_header)
            )

        @staticmethod
        def _to_pc2(points, header):
            from sensor_msgs.msg import PointCloud2, PointField

            msg = PointCloud2()
            msg.header = header
            msg.height = 1
            msg.width = len(points)
            msg.fields = [
                PointField(name=n, offset=4 * i, datatype=PointField.FLOAT32, count=1)
                for i, n in enumerate("xyz")
            ]
            msg.is_bigendian = False
            msg.point_step = 12
            msg.row_step = 12 * len(points)
            msg.data = np.asarray(points, np.float32).tobytes()
            msg.is_dense = True
            return msg

    rclpy.init(args=args)
    node = OdometryServer()
    try:
        rclpy.spin(node)
    finally:
        node.destroy_node()
        rclpy.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
