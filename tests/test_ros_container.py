"""Spec parsing of the rclpy composition container (no ROS needed)."""

from kiss_icp_tpu.ros.container import split_specs, _SPEC_RE


def test_ros_cli_tokens_are_not_specs():
    """Remaps/params ('name:=value') and --ros-args must pass through to
    rclpy untouched (round-3 review finding: '__node:=x' contains ':' and
    crashed the container as a bogus import spec)."""
    argv = ["--ros-args", "-r", "__node:=kiss_icp_tpu_container",
            "-p", "pointcloud_topic:=/points", "topic:=/points"]
    specs, ros_args = split_specs(argv)
    assert specs == []
    assert ros_args == argv


def test_space_separated_specs_in_one_token():
    """launch passes extra_nodes:='a.b:c d.e:f' as ONE argv element."""
    specs, ros_args = split_specs(["my_pkg.viz:make_node other.mod:factory"])
    assert specs == ["my_pkg.viz:make_node", "other.mod:factory"]
    assert ros_args == []


def test_mixed_argv():
    specs, ros_args = split_specs(
        ["", "my_pkg.viz:make_node", "--ros-args", "-p", "x:=1"])
    assert specs == ["my_pkg.viz:make_node"]
    assert ros_args == ["--ros-args", "-p", "x:=1"]


def test_spec_shape():
    assert _SPEC_RE.match("a.b.c:factory")
    assert not _SPEC_RE.match("a.b:=value")
    assert not _SPEC_RE.match("-r")
    assert not _SPEC_RE.match("a:b:c")
