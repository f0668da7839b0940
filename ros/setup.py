"""ament_python packaging for the kiss_icp_tpu ROS 2 wrapper.

The odometry engine itself ships as the regular `kiss_icp_tpu` Python wheel
(repo root pyproject.toml); this colcon package only installs the node entry
point plus launch/rviz/config assets, mirroring the role of the reference's
`ros/` package (CMake + rclcpp component there; ament_python + rclpy here).
"""

import os
from glob import glob

from setuptools import setup

package_name = "kiss_icp_tpu"

setup(
    name=package_name,
    version="0.3.0",
    packages=[],
    data_files=[
        ("share/ament_index/resource_index/packages",
         [os.path.join("resource", package_name)]),
        (f"share/{package_name}", ["package.xml"]),
        (f"share/{package_name}/launch", glob("launch/*.launch.py")),
        (f"share/{package_name}/rviz", glob("rviz/*.rviz")),
        (f"share/{package_name}/config", glob("config/*.yaml")),
    ],
    install_requires=["setuptools"],
    zip_safe=True,
    entry_points={
        "console_scripts": [
            "kiss_icp_tpu_node = kiss_icp_tpu.ros.odometry_server:main",
            "kiss_icp_tpu_container = kiss_icp_tpu.ros.container:main",
        ],
    },
)
