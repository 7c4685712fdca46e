"""roslaunch deployment surface parity.

The repo doubles as a ROS1 package: ``package.xml`` +
``launch/optic_flow_tpu.launch`` + ``scripts/optic_flow_tpu_node`` mirror
the reference's launch surface (reference ``launch/optic_flow.launch:25-60``,
``package.xml:1-30``).  These tests pin the remap surface and the node
wiring without a ROS installation.
"""

import os
import stat
import xml.etree.ElementTree as ET

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def launch_node():
    tree = ET.parse(os.path.join(REPO, "launch", "optic_flow_tpu.launch"))
    nodes = tree.getroot().findall(".//node")
    assert len(nodes) == 1
    return nodes[0]


def test_launch_remap_surface(launch_node):
    """Remaps cover the reference's live topic surface
    (launch/optic_flow.launch:44-58; tracker_status_in there is a stale
    name — the code subscribes active_tracker_in, src/optic_flow.cpp:1049)."""
    remaps = {r.get("from"): r.get("to") for r in launch_node.findall("remap")}
    # subscribers (reference :44-50)
    assert remaps["~active_tracker_in"] == "control_manager/diagnostics"
    assert remaps["~odometry_in"] == "odometry/orientation"
    assert remaps["~camera_in"] == "bluefox_optflow/image_raw"
    assert remaps["~camera_info_in"] == "bluefox_optflow/camera_info"
    assert remaps["~uav_height_in"] == "odometry/height"
    assert remaps["~imu_in"] == "mavros/imu/data"
    # publishers (reference :52-58; raw/tilt remaps there are stale names)
    assert remaps["~velocity_out"] == "~velocity"
    assert remaps["~velocity_out_longrange"] == "~velocity_longrange"
    assert remaps["~velocity_stddev_out"] == "~velocity_stddev"
    assert remaps["~allsac_chosen_out"] == "~allsac_chosen"


def test_launch_node_wiring(launch_node):
    """The launch file runs this package's executable with the tf2 frame
    args (reference params camera_frame/uav_frame/uav_untilted_frame,
    launch/optic_flow.launch:35-38)."""
    assert launch_node.get("pkg") == "mrs_optic_flow_tpu"
    assert launch_node.get("type") == "optic_flow_tpu_node"
    args = launch_node.get("args")
    for flag in ("--config", "--camera-frame", "--uav-frame",
                 "--uav-untilted-frame"):
        assert flag in args, flag


def test_node_executable_exists():
    path = os.path.join(REPO, "scripts", "optic_flow_tpu_node")
    assert os.stat(path).st_mode & stat.S_IXUSR, "must be executable"
    with open(path) as fh:
        assert fh.readline().startswith("#!"), "needs a shebang for roslaunch"


def test_package_manifest():
    root = ET.parse(os.path.join(REPO, "package.xml")).getroot()
    assert root.findtext("name") == "mrs_optic_flow_tpu"
    deps = {d.text for d in root.findall("exec_depend")}
    assert {"rospy", "tf2_ros", "sensor_msgs", "nav_msgs"} <= deps


def test_filter_ros_remap_args():
    """roslaunch appends __name:=... / __log:=... to every node's argv;
    the executable must strip them before argparse."""
    from mrs_optic_flow_tpu.__main__ import filter_ros_remap_args

    argv = ["--camera-frame", "uav1/cam", "__name:=optic_flow",
            "__log:=/tmp/x.log", "odom:=/uav1/odom"]
    assert filter_ros_remap_args(argv) == ["--camera-frame", "uav1/cam"]


def test_filter_ros2_launch_args():
    """ros2 launch appends a `--ros-args ... [--]` section (-r remaps,
    -p params, --params-file); everything in it must be stripped, while
    user args after the `--` terminator survive."""
    from mrs_optic_flow_tpu.__main__ import filter_ros_remap_args

    argv = ["--ros2", "--camera-frame", "uav1/cam",
            "--ros-args", "-r", "__node:=optic_flow", "-r", "__ns:=/uav1",
            "-p", "use_sim_time:=false", "--params-file", "/tmp/p.yaml"]
    assert filter_ros_remap_args(argv) == [
        "--ros2", "--camera-frame", "uav1/cam"]

    # `--` terminates the ros-args section; later user args survive
    argv2 = ["--ros2", "--ros-args", "-r", "a:=b", "--", "--uav-frame", "f"]
    assert filter_ros_remap_args(argv2) == ["--ros2", "--uav-frame", "f"]


def test_ros2_launch_file_surface():
    """The ROS2 launch twin passes --ros2 (the executable defaults to
    --ros only when no mode flag is present) and mirrors the remap
    surface under ~/ spelling."""
    path = os.path.join(REPO, "launch", "optic_flow_tpu.launch.py")
    src = open(path).read()
    assert "--ros2" in src
    for remap in ("~/camera_in", "~/camera_info_in", "~/uav_height_in",
                  "~/odometry_in", "~/imu_in", "~/active_tracker_in",
                  "~/velocity_out"):
        assert remap in src, remap


def test_node_executable_mode_selection():
    """scripts/optic_flow_tpu_node appends --ros only when the launch file
    did not already pick a mode (the ROS2 launch passes --ros2, which is
    mutually exclusive with --ros)."""
    src = open(os.path.join(REPO, "scripts", "optic_flow_tpu_node")).read()
    assert "--ros2" in src and '"--ros"' in src
