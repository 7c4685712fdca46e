"""ROS1 bridge tests with an injected fake rospy environment.

The bridge is the drop-in shim for the reference's nodelet transport
(``src/optic_flow.cpp:1036-1080``); these tests assert the topic surface
(names, conditional subscriptions/advertisements), the duck-typed message
conversions, the tf2 provider math, and an end-to-end synthetic flight
through fake ROS messages.
"""

import types

import numpy as np
import pytest

from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime.ros_bridge import (
    RosBridge,
    decode_image,
    from_camera_info,
    from_imu,
    from_odometry,
    tf_transform_provider,
)
from mrs_optic_flow_tpu.runtime.stream import SyntheticScene
from mrs_optic_flow_tpu.utils.quat_np import np_quat_from_rpy


# ------------------------------------------------------------------ #
# fake rospy / message classes                                        #
# ------------------------------------------------------------------ #


class _V3:
    def __init__(self):
        self.x = self.y = self.z = 0.0


class _Quat:
    def __init__(self):
        self.x = self.y = self.z = 0.0
        self.w = 1.0


class _Time:
    def __init__(self, sec=0.0):
        self._sec = float(sec)

    @staticmethod
    def from_sec(s):
        return _Time(s)

    def to_sec(self):
        return self._sec


class _Header:
    def __init__(self):
        self.stamp = _Time(0.0)
        self.frame_id = ""


class FakeTwistMsg:
    def __init__(self):
        self.header = _Header()
        self.twist = types.SimpleNamespace(
            twist=types.SimpleNamespace(linear=_V3(), angular=_V3()),
            covariance=[0.0] * 36,
        )


class FakeVector3(_V3):
    pass


class FakeFloat32:
    def __init__(self):
        self.data = 0.0


class FakeInt32:
    def __init__(self):
        self.data = 0


class FakeFloat64MultiArray:
    def __init__(self):
        self.data = []


class FakeImage:
    def __init__(self, arr, encoding, step_pad=0):
        h, w = arr.shape[:2]
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        self.header = _Header()
        self.height, self.width = h, w
        self.encoding = encoding
        self.step = w * ch + step_pad
        rows = arr.reshape(h, w * ch)
        if step_pad:
            rows = np.concatenate(
                [rows, np.zeros((h, step_pad), np.uint8)], axis=1
            )
        self.data = rows.astype(np.uint8).tobytes()


class FakeCameraInfo:
    def __init__(self, k, d, binning_x=0):
        self.header = _Header()
        self.K, self.D, self.binning_x = list(k), list(d), binning_x


class FakeImu:
    def __init__(self, stamp, rates=(0.0, 0.0, 0.0), quat=(0, 0, 0, 1)):
        self.header = _Header()
        self.header.stamp = _Time(stamp)
        self.angular_velocity = _V3()
        av = self.angular_velocity
        av.x, av.y, av.z = rates
        self.orientation = _Quat()
        q = self.orientation
        q.x, q.y, q.z, q.w = quat


class FakeOdometry:
    def __init__(self, stamp, quat=(0, 0, 0, 1), lin=(0, 0, 0)):
        self.header = _Header()
        self.header.stamp = _Time(stamp)
        q = _Quat()
        q.x, q.y, q.z, q.w = quat
        self.pose = types.SimpleNamespace(
            pose=types.SimpleNamespace(orientation=q)
        )
        v = _V3()
        v.x, v.y, v.z = lin
        self.twist = types.SimpleNamespace(
            twist=types.SimpleNamespace(linear=v, angular=_V3())
        )


class FakeFloat64Stamped:
    def __init__(self, stamp, value):
        self.header = _Header()
        self.header.stamp = _Time(stamp)
        self.value = value


class FakeTrackerDiag:
    def __init__(self, active_tracker):
        self.active_tracker = active_tracker


class FakePublisher:
    def __init__(self, topic, typ, queue_size=1):
        self.topic, self.type, self.queue_size = topic, typ, queue_size
        self.sent = []

    def publish(self, msg):
        self.sent.append(msg)


class FakeSubscriber:
    def __init__(self, topic, typ, cb, queue_size=1, tcp_nodelay=False):
        self.topic, self.type, self.cb = topic, typ, cb


def make_fake_rospy():
    pubs, subs = [], []

    def Publisher(topic, typ, queue_size=1):
        p = FakePublisher(topic, typ, queue_size)
        pubs.append(p)
        return p

    def Subscriber(topic, typ, cb, queue_size=1, tcp_nodelay=False):
        s = FakeSubscriber(topic, typ, cb, queue_size, tcp_nodelay)
        subs.append(s)
        return s

    warnings = []
    rospy = types.SimpleNamespace(
        Publisher=Publisher,
        Subscriber=Subscriber,
        Time=_Time,
        Duration=lambda s: s,
        loginfo=lambda *_: None,
        logwarn=lambda m: warnings.append(m),
        spin=lambda: None,
        _pubs=pubs,
        _subs=subs,
        _warnings=warnings,
    )
    return rospy


FAKE_TYPES = {
    "TwistWithCovarianceStamped": FakeTwistMsg,
    "Vector3": FakeVector3,
    "Float32": FakeFloat32,
    "Int32": FakeInt32,
    "Float64MultiArray": FakeFloat64MultiArray,
    "Image": FakeImage,
    "CameraInfo": FakeCameraInfo,
    "Imu": FakeImu,
    "Odometry": FakeOdometry,
    "Float64Stamped": FakeFloat64Stamped,
    "ControlManagerDiagnostics": FakeTrackerDiag,
}


class FakeTfBuffer:
    """Returns a c2b rotation of identity and a b2c yaw for cam_yaw tests."""

    def __init__(self, c2b=(0, 0, 0, 1), b2c=(0, 0, 0, 1), fail=0):
        self._map = {}
        self._fail = fail
        self.calls = 0
        self._c2b, self._b2c = c2b, b2c

    def lookup_transform(self, target, source, time, timeout):
        self.calls += 1
        if self._fail > 0:
            self._fail -= 1
            raise RuntimeError("tf lookup timed out")  # TransformException
        quat = self._c2b if (target, source) == ("fcu", "camera") else self._b2c
        q = _Quat()
        q.x, q.y, q.z, q.w = quat
        return types.SimpleNamespace(
            transform=types.SimpleNamespace(rotation=q)
        )


def make_bridge(fail_tf=0, **overrides):
    rospy = make_fake_rospy()
    buf = FakeTfBuffer(fail=fail_tf)
    bridge = RosBridge(
        load_config(overrides=overrides or None),
        camera_frame="camera",
        uav_frame="fcu",
        rospy_module=rospy,
        msg_types=FAKE_TYPES,
        tf_buffer=buf,
    )
    return bridge, rospy, buf


# ------------------------------------------------------------------ #
# topic surface                                                       #
# ------------------------------------------------------------------ #


def test_topic_surface_matches_reference():
    """Subscribed/advertised names match src/optic_flow.cpp:1036-1063 —
    under the node's private namespace ("~", the reference's private nodelet
    handle) — including the conditional imu subscription and raw
    advertisement."""
    bridge, rospy, _ = make_bridge()
    sub_topics = {s.topic for s in rospy._subs}
    assert sub_topics == {
        "~active_tracker_in", "~camera_info_in", "~camera_in",
        "~uav_height_in", "~odometry_in", "~imu_in",
    }
    pub_topics = {p.topic for p in rospy._pubs}
    assert {
        "~velocity_out", "~velocity_out_longrange",
        "~velocity_out_longrange_diff", "~velocity_stddev_out",
        "~max_velocity_out", "~allsac_chosen_out", "~points_raw_out",
    } <= pub_topics

    # ang_rate_source != imu -> no imu subscription (:1060-1063)
    bridge2, rospy2, _ = make_bridge(ang_rate_source="odometry")
    assert "~imu_in" not in {s.topic for s in rospy2._subs}

    # raw_output false -> points_raw_out not advertised (:1043-1046)
    bridge3, rospy3, _ = make_bridge(raw_output=False)
    assert "~points_raw_out" not in {p.topic for p in rospy3._pubs}


def test_launch_surface_covers_all_node_outputs():
    """Every topic the node can emit has a publisher mapping in the shared
    bridge table (ROS1 and ROS2 both consume ``_PUBLISHERS``) — the round-2
    gap where ``scale_rotation_out`` was silently dropped by both bridges.
    The node's publish call sites are scraped from source so a new output
    topic cannot be added without extending the table (or this list)."""
    import inspect
    import re

    from mrs_optic_flow_tpu.runtime import node as node_mod
    from mrs_optic_flow_tpu.runtime.ros_bridge import (
        _PUBLISHERS,
        NODE_OUTPUT_TOPICS,
    )

    assert set(NODE_OUTPUT_TOPICS) <= set(_PUBLISHERS), (
        set(NODE_OUTPUT_TOPICS) - set(_PUBLISHERS)
    )
    src = inspect.getsource(node_mod)
    emitted = set(re.findall(r"self\.publish\(\s*\"([a-z0-9_]+)\"", src))
    emitted |= set(re.findall(r"\(\"([a-z0-9_]+_out[a-z0-9_]*)\", ", src))
    emitted = {t for t in emitted if t.endswith(("_out", "_diff", "_longrange"))
               or t in NODE_OUTPUT_TOPICS}
    assert emitted <= set(NODE_OUTPUT_TOPICS), (
        emitted - set(NODE_OUTPUT_TOPICS)
    )


def test_scale_rotation_out_bridged():
    """The SR output crosses the bridge as a TwistWithCovarianceStamped:
    vz on linear.z, yaw rate on angular.z, raw scale in covariance[14]."""
    bridge, rospy, _ = make_bridge()
    pub = {p.topic: p for p in rospy._pubs}["~scale_rotation_out"]
    bridge._publish(
        "scale_rotation_out",
        {"stamp": 12.5, "scale": 1.02, "vz": 0.8, "yaw_rate": -0.3,
         "frame_id": "fcu"},
    )
    assert len(pub.sent) == 1
    m = pub.sent[0]
    assert m.header.frame_id == "fcu"
    assert m.twist.twist.linear.z == pytest.approx(0.8)
    assert m.twist.twist.angular.z == pytest.approx(-0.3)
    assert np.isnan(m.twist.twist.linear.x)
    assert m.twist.covariance[14] == pytest.approx(1.02)
    assert rospy._warnings == []


def test_unbridged_topic_warns_once():
    """An output with no publisher mapping logs ONE warning instead of
    vanishing silently (round-2 'silent drop' finding)."""
    bridge, rospy, _ = make_bridge()
    for _ in range(3):
        bridge._publish("mystery_new_topic_out", 1.0)
    assert len(rospy._warnings) == 1
    assert "mystery_new_topic_out" in rospy._warnings[0]
    # a known-but-unadvertised topic (raw_output off) stays quiet
    bridge2, rospy2, _ = make_bridge(raw_output=False)
    bridge2._publish("points_raw_out", np.zeros((2, 2)))
    assert rospy2._warnings == []


# ------------------------------------------------------------------ #
# converters                                                          #
# ------------------------------------------------------------------ #


def test_decode_image_encodings():
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)

    out = decode_image(FakeImage(bgr, "bgr8"))
    np.testing.assert_array_equal(out.data, bgr)

    # rgb8 is reordered to BGR (cv_bridge "bgr8" conversion semantics)
    out = decode_image(FakeImage(bgr[:, :, ::-1], "rgb8"))
    np.testing.assert_array_equal(out.data, bgr)

    # bgra8 drops alpha
    bgra = np.dstack([bgr, np.full((6, 5), 7, np.uint8)])
    out = decode_image(FakeImage(bgra, "bgra8"))
    np.testing.assert_array_equal(out.data, bgr)

    gray = bgr[:, :, 0]
    out = decode_image(FakeImage(gray, "mono8"))
    np.testing.assert_array_equal(out.data, gray)

    # row-stride padding is stripped
    out = decode_image(FakeImage(bgr, "bgr8", step_pad=13))
    np.testing.assert_array_equal(out.data, bgr)

    with pytest.raises(ValueError, match="encoding"):
        decode_image(FakeImage(gray, "32FC1"))

    # stamp flows through
    m = FakeImage(gray, "mono8")
    m.header.stamp = _Time(4.25)
    assert decode_image(m).stamp == 4.25


def test_sensor_converters():
    ci = from_camera_info(FakeCameraInfo(
        k=[420, 0, 376, 0, 420, 240, 0, 0, 1], d=[0.1, -0.2], binning_x=2))
    assert ci.matrix()[0, 0] == 420 and ci.binning_x == 2
    np.testing.assert_array_equal(ci.dist(), [0.1, -0.2, 0, 0, 0])  # padded

    # empty D -> zeros (pre-calibrated streams)
    assert from_camera_info(
        FakeCameraInfo(k=[1] * 9, d=[])).dist().tolist() == [0.0] * 5

    imu = from_imu(FakeImu(2.5, rates=(0.1, -0.2, 0.3)))
    assert imu.stamp == 2.5 and imu.angular_velocity == (0.1, -0.2, 0.3)

    odo = from_odometry(FakeOdometry(3.0, lin=(1.0, 2.0, 3.0)))
    assert odo.stamp == 3.0 and odo.linear_velocity == (1.0, 2.0, 3.0)


def test_tf_provider_math():
    """cam_yaw = yaw(base2cam) + pi/2 (src/optic_flow.cpp:1203-1208)."""
    b2c = tuple(np_quat_from_rpy(0.0, 0.0, 0.7))
    buf = FakeTfBuffer(c2b=(0, 0, 0, 1), b2c=b2c)
    provider = tf_transform_provider(buf, make_fake_rospy(), "fcu", "camera")
    c2b_quat, cam_yaw = provider()
    np.testing.assert_allclose(c2b_quat, [0, 0, 0, 1])
    assert abs(cam_yaw - (0.7 + np.pi / 2)) < 1e-9

    # a failing lookup raises (the node's poll treats it as not-yet)
    with pytest.raises(RuntimeError):
        tf_transform_provider(
            FakeTfBuffer(fail=1), make_fake_rospy(), "fcu", "camera")()


@pytest.mark.slow
def test_warmup_waits_for_camera_info():
    """warmup() before any camera_info blocks on the topic first — the
    reference's timerCamInit wait (src/optic_flow.cpp:1102-1158)."""
    # frame_size >= 8*sample_point_size so the long-range grid (frame/4,
    # patches 2*sps) warmed up by node.warmup is non-empty
    bridge, rospy, _ = make_bridge(mrs_optic_flow={
        "frame_size": 128, "sample_point_size": 16, "scale_factor": 1})
    waited = {}

    def wait_for_message(topic, typ, timeout=None):
        waited["args"] = (topic, typ, timeout)
        # intrinsics sized to the tiny 128 px test frame (cx centered)
        return FakeCameraInfo(k=[120.0, 0, 64.0, 0, 120.0, 64.0, 0, 0, 1],
                              d=[0.0] * 5)

    rospy.wait_for_message = wait_for_message
    assert not bridge.node.got_camera_info
    bridge.warmup((128, 128))
    assert waited["args"] == ("~camera_info_in", FakeCameraInfo, 15.0)
    assert bridge.node.got_camera_info


# ------------------------------------------------------------------ #
# end-to-end through fake ROS messages                                #
# ------------------------------------------------------------------ #


def _cb(rospy, topic):
    return next(s.cb for s in rospy._subs if s.topic == "~" + topic)


def _pub(rospy, topic):
    return next(p for p in rospy._pubs if p.topic == "~" + topic)


@pytest.mark.slow
def test_e2e_ros_flight():
    """Synthetic constant-velocity flight pushed through the ROS callbacks:
    the bridge resolves TFs from the (initially failing) fake tf2 buffer,
    converts bgr8 Images, and publishes ROS twist messages with the true
    velocity — the full reference deployment shape without ROS installed."""
    bridge, rospy, buf = make_bridge(fail_tf=1)
    node = bridge.node
    assert not node.got_tfs  # resolved lazily via the provider

    scene = SyntheticScene(uav_height=2.0, seed=1)
    v_true, dt, h = (0.8, -0.5), 0.05, 2.0

    ros_ci = FakeCameraInfo(k=list(scene.camera_info().k),
                            d=list(scene.camera_info().d))
    _cb(rospy, "camera_info_in")(ros_ci)
    _cb(rospy, "active_tracker_in")(FakeTrackerDiag("MpcTracker"))

    # TF poll #1 (fails) happens on a frame 1 s before the flight — the
    # node retries at most once per second (timerTf's 1 Hz cadence)
    _cb(rospy, "odometry_in")(FakeOdometry(9.0))
    _cb(rospy, "imu_in")(FakeImu(9.0))
    _cb(rospy, "uav_height_in")(FakeFloat64Stamped(9.0, h))
    img0 = FakeImage(np.zeros((480, 752, 3), np.uint8), "bgr8")
    img0.header.stamp = _Time(9.0)
    _cb(rospy, "camera_in")(img0)
    assert not node.got_tfs and buf.calls == 1

    n_frames = 6
    for i in range(n_frames):
        t = 10.0 + i * dt
        _cb(rospy, "odometry_in")(FakeOdometry(t))
        _cb(rospy, "imu_in")(FakeImu(t))
        _cb(rospy, "uav_height_in")(FakeFloat64Stamped(t, h))
        frame = scene.render((v_true[0] * i * dt, v_true[1] * i * dt))
        bgr = np.repeat(frame.astype(np.uint8)[:, :, None], 3, axis=2)
        img = FakeImage(bgr, "bgr8")
        img.header.stamp = _Time(t)
        _cb(rospy, "camera_in")(img)

    assert node.got_tfs and buf.calls >= 3  # first poll failed, second won
    sent = _pub(rospy, "velocity_out").sent
    assert len(sent) >= 2
    v = np.array([[m.twist.twist.linear.x, m.twist.twist.linear.y]
                  for m in sent[1:]])
    assert np.abs(v - np.array(v_true)).max() < 0.15, v
    last = sent[-1]
    assert last.header.frame_id == "fcu_untilted"
    assert abs(last.header.stamp.to_sec() - (10.0 + (n_frames - 1) * dt)) < 1e-9
    cov = np.asarray(last.twist.covariance)
    assert cov.shape == (36,) and cov[0] == pytest.approx((50.0 * h / 420.0) ** 2)

    # diagnostics topics carry converted payloads
    lat = _pub(rospy, "processing_latency_out").sent
    assert lat and all(isinstance(m.data, float) for m in lat)
    raw = _pub(rospy, "points_raw_out").sent
    assert raw and len(raw[-1].data) == 32  # 16 windows x 2
    chosen = _pub(rospy, "allsac_chosen_out").sent
    assert chosen and isinstance(chosen[-1].data, int)
