"""ROS2 bridge tests with an injected fake rclpy environment — the rclpy
twin of tests/test_ros_bridge.py: topic surface under the ``~/`` private
namespace, QoS routing (sensor-data profile on camera/IMU), ROS2 stamp and
CameraInfo field-spelling handling in the shared converters, the tf2
provider math, and an end-to-end synthetic flight."""

import types

import numpy as np
import pytest

from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime.ros2_bridge import (
    Ros2Bridge,
    tf2_transform_provider,
)
from mrs_optic_flow_tpu.runtime.ros_bridge import decode_image, from_camera_info
from mrs_optic_flow_tpu.runtime.stream import SyntheticScene
from mrs_optic_flow_tpu.utils.quat_np import np_quat_from_rpy

from test_ros_bridge import (  # noqa: F401 — shared fake message shapes
    FakeFloat32,
    FakeFloat64MultiArray,
    FakeImage,
    FakeInt32,
    FakeVector3,
    _Quat,
    _V3,
)

SENSOR_QOS = object()  # sentinel standing in for qos_profile_sensor_data


# ------------------------------------------------------------------ #
# ROS2-flavored fakes                                                 #
# ------------------------------------------------------------------ #


class _Stamp2:
    """builtin_interfaces/Time: int sec + nanosec."""

    def __init__(self, t=0.0):
        self.sec = int(t)
        self.nanosec = int(round((t - int(t)) * 1e9))


class _Header2:
    def __init__(self, t=0.0):
        self.stamp = _Stamp2(t)
        self.frame_id = ""


class FakeTwistMsg2:
    def __init__(self):
        self.header = _Header2()
        self.twist = types.SimpleNamespace(
            twist=types.SimpleNamespace(linear=_V3(), angular=_V3()),
            covariance=[0.0] * 36,
        )


class FakeCameraInfo2:
    """ROS2 spells the calibration fields lowercase (k/d/r/p)."""

    def __init__(self, k, d, binning_x=0):
        self.header = _Header2()
        self.k, self.d, self.binning_x = list(k), list(d), binning_x


class FakeImu2:
    def __init__(self, stamp, rates=(0.0, 0.0, 0.0), quat=(0, 0, 0, 1)):
        self.header = _Header2(stamp)
        self.angular_velocity = _V3()
        av = self.angular_velocity
        av.x, av.y, av.z = rates
        self.orientation = _Quat()
        q = self.orientation
        q.x, q.y, q.z, q.w = quat


class FakeOdometry2:
    def __init__(self, stamp, quat=(0, 0, 0, 1), lin=(0, 0, 0)):
        self.header = _Header2(stamp)
        q = _Quat()
        q.x, q.y, q.z, q.w = quat
        self.pose = types.SimpleNamespace(
            pose=types.SimpleNamespace(orientation=q))
        v = _V3()
        v.x, v.y, v.z = lin
        self.twist = types.SimpleNamespace(
            twist=types.SimpleNamespace(linear=v, angular=_V3()))


class FakeFloat64Stamped2:
    def __init__(self, stamp, value):
        self.header = _Header2(stamp)
        self.value = value


class FakeTrackerDiag2:
    def __init__(self, active_tracker):
        self.active_tracker = active_tracker


class FakeImage2(FakeImage):
    def __init__(self, arr, encoding, stamp=0.0, step_pad=0):
        super().__init__(arr, encoding, step_pad)
        self.header = _Header2(stamp)


FAKE_TYPES2 = {
    "TwistWithCovarianceStamped": FakeTwistMsg2,
    "Vector3": FakeVector3,
    "Float32": FakeFloat32,
    "Int32": FakeInt32,
    "Float64MultiArray": FakeFloat64MultiArray,
    "Image": FakeImage2,
    "CameraInfo": FakeCameraInfo2,
    "Imu": FakeImu2,
    "Odometry": FakeOdometry2,
    "Float64Stamped": FakeFloat64Stamped2,
    "ControlManagerDiagnostics": FakeTrackerDiag2,
}


class FakePublisher2:
    def __init__(self, typ, topic, qos):
        self.type, self.topic, self.qos = typ, topic, qos
        self.sent = []

    def publish(self, msg):
        self.sent.append(msg)


class FakeSubscription2:
    def __init__(self, typ, topic, cb, qos):
        self.type, self.topic, self.cb, self.qos = typ, topic, cb, qos


class FakeRclpyNode:
    def __init__(self, name="optic_flow"):
        self.name = name
        self.pubs, self.subs = [], []
        self.logged = []
        self.warned = []

    def create_publisher(self, typ, topic, qos):
        p = FakePublisher2(typ, topic, qos)
        self.pubs.append(p)
        return p

    def create_subscription(self, typ, topic, cb, qos):
        s = FakeSubscription2(typ, topic, cb, qos)
        self.subs.append(s)
        return s

    def get_logger(self):
        return types.SimpleNamespace(
            info=self.logged.append, warn=self.warned.append
        )


class _Time2:
    def __init__(self, *a, **kw):
        pass


class _Duration2:
    def __init__(self, *, seconds=0.0):
        self.seconds = seconds


def make_fake_rclpy():
    created = []

    def create_node(name):
        n = FakeRclpyNode(name)
        created.append(n)
        return n

    return types.SimpleNamespace(
        create_node=create_node,
        spin=lambda node: None,
        spin_once=lambda node, timeout_sec=0.1: None,
        _created=created,
    )


class FakeTfBuffer2:
    def __init__(self, c2b=(0, 0, 0, 1), b2c=(0, 0, 0, 1), fail=0):
        self._fail = fail
        self.calls = 0
        self._c2b, self._b2c = c2b, b2c
        self.last_args = None

    def lookup_transform(self, target, source, time, timeout):
        self.calls += 1
        self.last_args = (target, source, time, timeout)
        if self._fail > 0:
            self._fail -= 1
            raise RuntimeError("tf lookup timed out")
        quat = self._c2b if (target, source) == ("fcu", "camera") else self._b2c
        q = _Quat()
        q.x, q.y, q.z, q.w = quat
        return types.SimpleNamespace(
            transform=types.SimpleNamespace(rotation=q))


def make_bridge(fail_tf=0, **overrides):
    rclpy = make_fake_rclpy()
    buf = FakeTfBuffer2(fail=fail_tf)
    bridge = Ros2Bridge(
        load_config(overrides=overrides or None),
        camera_frame="camera",
        uav_frame="fcu",
        rclpy_module=rclpy,
        msg_types=FAKE_TYPES2,
        tf_buffer=buf,
        time_cls=_Time2,
        duration_cls=_Duration2,
        sensor_qos=SENSOR_QOS,
    )
    return bridge, rclpy, buf


# ------------------------------------------------------------------ #
# topic surface + QoS                                                 #
# ------------------------------------------------------------------ #


def test_topic_surface_matches_reference():
    """Same topic set as the ROS1 bridge / reference
    (src/optic_flow.cpp:1036-1063), under ROS2's ``~/`` private-namespace
    spelling; conditional imu subscription and raw advertisement hold."""
    bridge, rclpy, _ = make_bridge()
    handle = bridge.handle
    assert {s.topic for s in handle.subs} == {
        "~/active_tracker_in", "~/camera_info_in", "~/camera_in",
        "~/uav_height_in", "~/odometry_in", "~/imu_in",
    }
    assert {
        "~/velocity_out", "~/velocity_out_longrange",
        "~/velocity_out_longrange_diff", "~/velocity_stddev_out",
        "~/max_velocity_out", "~/allsac_chosen_out", "~/points_raw_out",
    } <= {p.topic for p in handle.pubs}

    bridge2, _, _ = make_bridge(ang_rate_source="odometry")
    assert "~/imu_in" not in {s.topic for s in bridge2.handle.subs}

    bridge3, _, _ = make_bridge(raw_output=False)
    assert "~/points_raw_out" not in {p.topic for p in bridge3.handle.pubs}


def test_scale_rotation_out_bridged_and_warn_once():
    """``scale_rotation_out`` reaches ROS2 (vz on linear.z, yaw rate on
    angular.z, scale in covariance[14] — the shared ``_PUBLISHERS`` entry),
    and an unmapped topic warns exactly once instead of dropping silently."""
    bridge, _, _ = make_bridge()
    pub = {p.topic: p for p in bridge.handle.pubs}["~/scale_rotation_out"]
    bridge._publish(
        "scale_rotation_out",
        {"stamp": 3.25, "scale": 0.98, "vz": -0.4, "yaw_rate": 0.1,
         "frame_id": "fcu"},
    )
    assert len(pub.sent) == 1
    m = pub.sent[0]
    assert m.twist.twist.linear.z == pytest.approx(-0.4)
    assert m.twist.twist.angular.z == pytest.approx(0.1)
    assert m.twist.covariance[14] == pytest.approx(0.98)
    assert m.header.stamp.sec == 3 and m.header.stamp.nanosec == 250_000_000

    for _ in range(3):
        bridge._publish("mystery_new_topic_out", 1.0)
    assert len(bridge.handle.warned) == 1
    assert "mystery_new_topic_out" in bridge.handle.warned[0]


def test_sensor_topics_use_sensor_qos():
    """Camera + IMU subscribe with the sensor-data QoS profile (camera
    drivers publish best-effort; a reliable subscription gets nothing),
    state topics with the plain depth."""
    bridge, _, _ = make_bridge()
    qos_of = {s.topic: s.qos for s in bridge.handle.subs}
    assert qos_of["~/camera_in"] is SENSOR_QOS
    assert qos_of["~/camera_info_in"] is SENSOR_QOS
    assert qos_of["~/imu_in"] is SENSOR_QOS
    assert qos_of["~/odometry_in"] == 1
    assert qos_of["~/uav_height_in"] == 1


# ------------------------------------------------------------------ #
# converters under ROS2 shapes                                        #
# ------------------------------------------------------------------ #


def test_ros2_stamp_and_camera_info_fields():
    """The shared converters accept ROS2's builtin_interfaces stamps and
    lowercase CameraInfo fields."""
    img = FakeImage2(np.zeros((4, 5), np.uint8), "mono8", stamp=4.25)
    assert decode_image(img).stamp == pytest.approx(4.25)

    ci = from_camera_info(FakeCameraInfo2(
        k=[420, 0, 376, 0, 420, 240, 0, 0, 1], d=[0.1, -0.2], binning_x=2))
    assert ci.matrix()[0, 0] == 420 and ci.binning_x == 2
    np.testing.assert_array_equal(ci.dist(), [0.1, -0.2, 0, 0, 0])


def test_tf2_provider_math():
    """cam_yaw = yaw(base2cam) + pi/2 (src/optic_flow.cpp:1203-1208),
    with rclpy Time()/Duration(seconds=) lookup arguments."""
    b2c = tuple(np_quat_from_rpy(0.0, 0.0, 0.7))
    buf = FakeTfBuffer2(c2b=(0, 0, 0, 1), b2c=b2c)
    provider = tf2_transform_provider(buf, _Time2, _Duration2, "fcu", "camera")
    c2b_quat, cam_yaw = provider()
    np.testing.assert_allclose(c2b_quat, [0, 0, 0, 1])
    assert abs(cam_yaw - (0.7 + np.pi / 2)) < 1e-9
    assert isinstance(buf.last_args[2], _Time2)
    assert isinstance(buf.last_args[3], _Duration2)
    assert buf.last_args[3].seconds == pytest.approx(2.0)

    with pytest.raises(RuntimeError):
        tf2_transform_provider(
            FakeTfBuffer2(fail=1), _Time2, _Duration2, "fcu", "camera")()


def test_builtin_stamp_normalized():
    """Stamps just under a whole second must not round to nanosec == 1e9
    (builtin_interfaces/Time requires nanosec < 1e9)."""
    from mrs_optic_flow_tpu.runtime.ros_bridge import set_builtin_stamp

    st = _Stamp2()
    set_builtin_stamp(st, 5.0 - 2e-10)
    assert (st.sec, st.nanosec) == (5, 0)
    set_builtin_stamp(st, 4.999999999)
    assert st.sec == 4 and st.nanosec == 999999999
    set_builtin_stamp(st, 10.25)
    assert (st.sec, st.nanosec) == (10, 250000000)


@pytest.mark.slow
def test_warmup_spins_for_camera_info():
    """warmup() before any camera_info spins the executor on the topic
    first — the reference's timerCamInit wait; a silent topic raises at
    the 15 s-analog timeout."""
    bridge, rclpy, _ = make_bridge(mrs_optic_flow={
        "frame_size": 128, "sample_point_size": 16, "scale_factor": 1})
    info_cb = next(s.cb for s in bridge.handle.subs
                   if s.topic == "~/camera_info_in")
    spins = []

    def spin_once(node, timeout_sec=0.1):
        spins.append(timeout_sec)
        if len(spins) == 3:  # camera info "arrives" on the third spin
            info_cb(FakeCameraInfo2(
                k=[120.0, 0, 64.0, 0, 120.0, 64.0, 0, 0, 1], d=[0.0] * 5))

    rclpy.spin_once = spin_once
    assert not bridge.node.got_camera_info
    bridge.warmup((128, 128))
    assert bridge.node.got_camera_info and len(spins) == 3

    bridge2, rclpy2, _ = make_bridge()
    rclpy2.spin_once = lambda node, timeout_sec=0.1: None
    with pytest.raises(TimeoutError, match="camera info"):
        bridge2.warmup(camera_info_timeout_s=0.2)


# ------------------------------------------------------------------ #
# end-to-end through fake ROS2 messages                               #
# ------------------------------------------------------------------ #


def _cb(handle, topic):
    return next(s.cb for s in handle.subs if s.topic == "~/" + topic)


def _pub(handle, topic):
    return next(p for p in handle.pubs if p.topic == "~/" + topic)


def test_e2e_ros2_flight():
    """Synthetic constant-velocity flight through the rclpy callbacks:
    tf resolution via the (initially failing) provider, bgr8 decode, and
    ROS2 twist messages carrying the true velocity with sec/nanosec
    stamps — the ROS2 deployment shape without rclpy installed."""
    bridge, rclpy, buf = make_bridge(fail_tf=1)
    node, handle = bridge.node, bridge.handle
    assert not node.got_tfs

    scene = SyntheticScene(uav_height=2.0, seed=1)
    v_true, dt, h = (0.8, -0.5), 0.05, 2.0

    _cb(handle, "camera_info_in")(FakeCameraInfo2(
        k=list(scene.camera_info().k), d=list(scene.camera_info().d)))
    _cb(handle, "active_tracker_in")(FakeTrackerDiag2("MpcTracker"))

    # TF poll #1 (fails) on a frame 1 s before the flight (1 Hz retry)
    _cb(handle, "odometry_in")(FakeOdometry2(9.0))
    _cb(handle, "imu_in")(FakeImu2(9.0))
    _cb(handle, "uav_height_in")(FakeFloat64Stamped2(9.0, h))
    _cb(handle, "camera_in")(
        FakeImage2(np.zeros((480, 752, 3), np.uint8), "bgr8", stamp=9.0))
    assert not node.got_tfs and buf.calls == 1

    n_frames = 6
    for i in range(n_frames):
        t = 10.0 + i * dt
        _cb(handle, "odometry_in")(FakeOdometry2(t))
        _cb(handle, "imu_in")(FakeImu2(t))
        _cb(handle, "uav_height_in")(FakeFloat64Stamped2(t, h))
        frame = scene.render((v_true[0] * i * dt, v_true[1] * i * dt))
        bgr = np.repeat(frame.astype(np.uint8)[:, :, None], 3, axis=2)
        _cb(handle, "camera_in")(FakeImage2(bgr, "bgr8", stamp=t))

    assert node.got_tfs and buf.calls >= 3
    sent = _pub(handle, "velocity_out").sent
    assert len(sent) >= 2
    v = np.array([[m.twist.twist.linear.x, m.twist.twist.linear.y]
                  for m in sent[1:]])
    assert np.abs(v - np.array(v_true)).max() < 0.15, v
    last = sent[-1]
    assert last.header.frame_id == "fcu_untilted"
    t_last = 10.0 + (n_frames - 1) * dt
    assert last.header.stamp.sec == int(t_last)
    assert last.header.stamp.nanosec == pytest.approx(
        round((t_last - int(t_last)) * 1e9), abs=1)
    cov = np.asarray(last.twist.covariance)
    assert cov.shape == (36,) and cov[0] == pytest.approx((50.0 * h / 420.0) ** 2)

    raw = _pub(handle, "points_raw_out").sent
    assert raw and len(raw[-1].data) == 32  # 16 windows x 2
    lat = _pub(handle, "processing_latency_out").sent
    assert lat and all(isinstance(m.data, float) for m in lat)
