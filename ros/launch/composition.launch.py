"""Launch the odometry node composed with other rclpy nodes in ONE process.

The reference deploys its node as an rclcpp component inside a
component_container (shared process, intra-process comms). rclcpp containers
cannot host Python nodes, so this launch runs the rclpy analog:
`kiss_icp_tpu.ros.container` spins the odometry node plus any
`module.path:factory` node specs on one MultiThreadedExecutor — a single
process and DDS participant.

    ros2 launch kiss_icp_tpu composition.launch.py topic:=/points \
        extra_nodes:="my_pkg.monitor:make_node"
"""

from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument
from launch.substitutions import LaunchConfiguration
from launch_ros.actions import Node

PACKAGE = "kiss_icp_tpu"


def generate_launch_description():
    topic = LaunchConfiguration("topic")
    extra_nodes = LaunchConfiguration("extra_nodes", default="")

    declared = [
        DeclareLaunchArgument("topic", description="PointCloud2 topic to subscribe"),
        DeclareLaunchArgument(
            "extra_nodes", default_value="",
            description="Space-separated module.path:factory specs of other "
                        "rclpy nodes to compose into the same process",
        ),
        DeclareLaunchArgument("base_frame", default_value=""),
        DeclareLaunchArgument("lidar_odom_frame", default_value="odom_lidar"),
        DeclareLaunchArgument("publish_odom_tf", default_value="true"),
        DeclareLaunchArgument("use_sim_time", default_value="true"),
    ]

    container = Node(
        package=PACKAGE,
        executable="kiss_icp_tpu_container",
        name="kiss_icp_tpu_container",
        output="screen",
        arguments=[extra_nodes],
        parameters=[
            {
                "pointcloud_topic": topic,
                "base_frame": LaunchConfiguration("base_frame"),
                "lidar_odom_frame": LaunchConfiguration("lidar_odom_frame"),
                "publish_odom_tf": LaunchConfiguration("publish_odom_tf"),
                "use_sim_time": LaunchConfiguration("use_sim_time"),
            }
        ],
    )
    return LaunchDescription(declared + [container])
