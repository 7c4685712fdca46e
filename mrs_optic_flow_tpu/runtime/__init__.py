"""Runtime / node layer (L5 of the reference).

Replaces the ROS nodelet plumbing of ``src/optic_flow.cpp`` with a
transport-agnostic node:

- :mod:`.msgs` — message dataclasses mirroring the ROS types the reference
  subscribes to / publishes;
- :mod:`.node` — :class:`OpticFlowNode`: readiness gating, rate limiting,
  sensor fusion state, engine + geometry orchestration, twist publishing;
- :mod:`.stream` — rosbag-replay-style harness: timestamped event streams
  (frames, IMU, odometry, height) driven through the node, plus a synthetic
  scene generator for end-to-end tests;
- :mod:`.ros_bridge` — optional ROS1 shim (:class:`RosBridge`): the
  reference's nodelet transport surface (same topic names/types) around the
  transport-agnostic node; imports ``rospy`` lazily;
- :mod:`.ros2_bridge` — the ``rclpy`` twin (:class:`Ros2Bridge`): same
  topic surface on a ROS2 graph, sensor-data QoS for camera/IMU, shared
  converters; imports ``rclpy`` lazily;
- :mod:`.rosbag` — offline ROS1 rosbag (2.0) replay: parses the bag
  container and the node's input message types without a ROS install;
- :mod:`.rosbag2` — offline ROS2 rosbag2 replay: reads the sqlite3
  (``.db3``) storage and decodes the CDR message payloads, same
  role-resolution/replay semantics as the ROS1 path;

- :mod:`.profiler` — the ``mrs_lib::Profiler``/``Routine`` equivalent;
- :mod:`.viz` — flow-overlay rendering replacing the GUI window / video
  writer (``src/FftMethod.cpp:1859-1897``).
"""

from mrs_optic_flow_tpu.runtime.msgs import (  # noqa: F401
    CameraInfo,
    Imu,
    Odometry,
    TwistWithCovarianceStamped,
)
from mrs_optic_flow_tpu.runtime.fleet import FleetServer, FleetTick  # noqa: F401
from mrs_optic_flow_tpu.runtime.fleet_feeder import FleetFeeder  # noqa: F401
from mrs_optic_flow_tpu.runtime.node import OpticFlowNode  # noqa: F401
from mrs_optic_flow_tpu.runtime.profiler import Profiler  # noqa: F401
from mrs_optic_flow_tpu.runtime.ros2_bridge import Ros2Bridge  # noqa: F401
from mrs_optic_flow_tpu.runtime.ros_bridge import RosBridge  # noqa: F401
from mrs_optic_flow_tpu.runtime.rosbag import (  # noqa: F401
    BagReader,
    BagWriter,
    replay_bag,
)
from mrs_optic_flow_tpu.runtime.rosbag2 import (  # noqa: F401
    Bag2Reader,
    Bag2Writer,
    replay_bag2,
)
from mrs_optic_flow_tpu.runtime.stream import FrameStream, SyntheticScene  # noqa: F401
