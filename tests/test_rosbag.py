"""Offline rosbag replay (runtime/rosbag.py): container parsing, ROS1
message deserialization, topic resolution, and a recorded synthetic flight
driven end-to-end through the node — without any ROS installation.

The writer below produces genuine rosbag 2.0 bytes (magic, bag-header
record, connection records, chunked message records) so the reader is
tested against the real wire format, not a mock.
"""

import bz2
import struct

import numpy as np
import pytest

from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime import OpticFlowNode, SyntheticScene
from mrs_optic_flow_tpu.runtime.rosbag import (
    BagFormatError,
    BagReader,
    decode_camera_info_msg,
    decode_float64_stamped_msg,
    decode_image_msg,
    decode_imu_msg,
    decode_odometry_msg,
    replay_bag,
    resolve_topics,
)

# ------------------------------------------------------------------ #
# minimal rosbag 2.0 writer (the format, spelled out)                 #
# ------------------------------------------------------------------ #

MAGIC = b"#ROSBAG V2.0\n"


def _field(name: str, value: bytes) -> bytes:
    f = name.encode() + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _time(t: float) -> bytes:
    secs = int(t)
    return struct.pack("<II", secs, int(round((t - secs) * 1e9)))


def conn_record(conn: int, topic: str, type_name: str) -> bytes:
    data = (
        _field("topic", topic.encode())
        + _field("type", type_name.encode())
        + _field("md5sum", b"*")
        + _field("message_definition", b"")
    )
    return _record(
        {"op": b"\x07", "conn": struct.pack("<I", conn), "topic": topic.encode()},
        data,
    )


def msg_record(conn: int, t: float, payload: bytes) -> bytes:
    return _record(
        {"op": b"\x02", "conn": struct.pack("<I", conn), "time": _time(t)}, payload
    )


def write_bag(path, records, compression="none"):
    chunk = b"".join(records)
    blob = bz2.compress(chunk) if compression == "bz2" else chunk
    out = MAGIC
    out += _record(
        {
            "op": b"\x03",
            "index_pos": struct.pack("<Q", 0),
            "conn_count": struct.pack("<I", 8),
            "chunk_count": struct.pack("<I", 1),
        },
        b" " * 4096,  # rosbag pads the bag header record
    )
    out += _record(
        {
            "op": b"\x05",
            "compression": compression.encode(),
            "size": struct.pack("<I", len(chunk)),
        },
        blob,
    )
    path.write_bytes(out)
    return str(path)


# --- ROS1 message serializers (little-endian wire format) ----------- #


def _string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def _header(stamp: float, frame: str = "") -> bytes:
    secs = int(stamp)
    return (
        struct.pack("<III", 0, secs, int(round((stamp - secs) * 1e9)))
        + _string(frame)
    )


def ser_image(stamp: float, img: np.ndarray, step_pad: int = 0) -> bytes:
    h, w = img.shape
    step = w + step_pad
    rows = img
    if step_pad:
        rows = np.pad(img, ((0, 0), (0, step_pad)))
    return (
        _header(stamp)
        + struct.pack("<II", h, w)
        + _string("mono8")
        + b"\x00"
        + struct.pack("<I", step)
        + struct.pack("<I", h * step)
        + rows.tobytes()
    )


def ser_camera_info(stamp: float, k, d, binning_x: int = 0) -> bytes:
    return (
        _header(stamp)
        + struct.pack("<II", 480, 752)
        + _string("plumb_bob")
        + struct.pack("<I", len(d))
        + struct.pack(f"<{len(d)}d", *d)
        + struct.pack("<9d", *k)
        + struct.pack("<9d", *([0.0] * 9))  # R
        + struct.pack("<12d", *([0.0] * 12))  # P
        + struct.pack("<II", binning_x, 0)
        + struct.pack("<IIII", 0, 0, 0, 0)  # roi
        + b"\x00"  # do_rectify
    )


def ser_imu(stamp: float, quat=(0.0, 0.0, 0.0, 1.0), ang=(0.0, 0.0, 0.0)) -> bytes:
    return (
        _header(stamp)
        + struct.pack("<4d", *quat)
        + struct.pack("<9d", *([0.0] * 9))
        + struct.pack("<3d", *ang)
        + struct.pack("<9d", *([0.0] * 9))
        + struct.pack("<3d", 0.0, 0.0, 0.0)
        + struct.pack("<9d", *([0.0] * 9))
    )


def ser_odometry(
    stamp: float, quat=(0.0, 0.0, 0.0, 1.0), lin=(0.0, 0.0, 0.0), ang=(0.0, 0.0, 0.0)
) -> bytes:
    return (
        _header(stamp)
        + _string("fcu")
        + struct.pack("<3d", 0.0, 0.0, 0.0)
        + struct.pack("<4d", *quat)
        + struct.pack("<36d", *([0.0] * 36))
        + struct.pack("<3d", *lin)
        + struct.pack("<3d", *ang)
        + struct.pack("<36d", *([0.0] * 36))
    )


def ser_height(stamp: float, v: float) -> bytes:
    return _header(stamp) + struct.pack("<d", v)


# ------------------------------------------------------------------ #
# decoder units                                                       #
# ------------------------------------------------------------------ #


def test_decode_image_respects_stride():
    img = np.arange(6 * 8, dtype=np.uint8).reshape(6, 8)
    msg = decode_image_msg(ser_image(12.25, img, step_pad=3))
    assert msg.stamp == pytest.approx(12.25)
    np.testing.assert_array_equal(msg.data, img)


def test_decode_camera_info():
    k = [420.0, 0, 376.0, 0, 421.0, 240.0, 0, 0, 1]
    ci = decode_camera_info_msg(ser_camera_info(1.0, k, [0.1, -0.2], binning_x=2))
    assert ci.k == k
    assert ci.d[:2] == [0.1, -0.2] and len(ci.d) == 5  # zero-padded to 5
    assert ci.binning_x == 2


def test_decode_imu_odometry_height():
    imu = decode_imu_msg(ser_imu(2.5, quat=(0.1, 0.2, 0.3, 0.9), ang=(0.4, 0.5, 0.6)))
    assert imu.stamp == pytest.approx(2.5)
    assert imu.orientation == pytest.approx((0.1, 0.2, 0.3, 0.9))
    assert imu.angular_velocity == pytest.approx((0.4, 0.5, 0.6))

    od = decode_odometry_msg(
        ser_odometry(3.5, quat=(0.0, 0.0, 0.1, 0.99), lin=(1.0, -2.0, 0.5))
    )
    assert od.stamp == pytest.approx(3.5)
    assert od.orientation == pytest.approx((0.0, 0.0, 0.1, 0.99))
    assert od.linear_velocity == pytest.approx((1.0, -2.0, 0.5))

    hh = decode_float64_stamped_msg(ser_height(4.0, 2.75))
    assert (hh.stamp, hh.value) == (pytest.approx(4.0), pytest.approx(2.75))


# ------------------------------------------------------------------ #
# container / resolution                                              #
# ------------------------------------------------------------------ #


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "not.bag"
    p.write_bytes(b"#ROSBAG V1.2\n junk")
    with pytest.raises(BagFormatError, match="not a rosbag 2.0"):
        BagReader(str(p))


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_reader_roundtrip(tmp_path, compression):
    img = np.full((4, 4), 7, np.uint8)
    records = [
        conn_record(0, "/uav1/bluefox_optflow/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/uav1/odometry/height", "mrs_msgs/Float64Stamped"),
        msg_record(0, 10.0, ser_image(10.0, img)),
        msg_record(1, 10.1, ser_height(10.1, 2.0)),
    ]
    path = write_bag(tmp_path / f"{compression}.bag", records, compression)
    got = list(BagReader(path).messages())
    assert [(round(t, 3), topic, tn) for t, topic, tn, _ in got] == [
        (10.0, "/uav1/bluefox_optflow/image_raw", "sensor_msgs/Image"),
        (10.1, "/uav1/odometry/height", "mrs_msgs/Float64Stamped"),
    ]
    np.testing.assert_array_equal(decode_image_msg(got[0][3]).data, img)


def test_resolve_topics_ambiguity(tmp_path):
    records = [
        conn_record(0, "/a/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/b/image_raw", "sensor_msgs/Image"),
    ]
    path = write_bag(tmp_path / "two.bag", records)
    with pytest.raises(BagFormatError, match="several sensor_msgs/Image"):
        resolve_topics(BagReader(path))
    routing = resolve_topics(BagReader(path), {"image": "/b/image_raw"})
    assert set(routing) == {"/b/image_raw"}
    with pytest.raises(BagFormatError, match="unknown replay roles"):
        resolve_topics(BagReader(path), {"image": "/b/image_raw", "lidar": "/x"})


# ------------------------------------------------------------------ #
# end-to-end: recorded flight -> twists                               #
# ------------------------------------------------------------------ #

V_TRUE = (0.8, -0.5)
HEIGHT = 2.0
DT = 0.05


def _flight_bag(tmp_path, *, full: bool, n_frames: int = 6, compression="none"):
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    records = [conn_record(0, "/uav1/bluefox_optflow/image_raw", "sensor_msgs/Image")]
    if full:
        records += [
            conn_record(1, "/uav1/bluefox_optflow/camera_info",
                        "sensor_msgs/CameraInfo"),
            conn_record(2, "/uav1/mavros/imu/data", "sensor_msgs/Imu"),
            conn_record(3, "/uav1/odometry/orientation", "nav_msgs/Odometry"),
            conn_record(4, "/uav1/odometry/height", "mrs_msgs/Float64Stamped"),
        ]
        records.append(msg_record(1, 99.0, ser_camera_info(
            99.0, [scene.fx, 0, scene.cx, 0, scene.fy, scene.cy, 0, 0, 1],
            [0.0] * 5)))
    for i in range(n_frames):
        t = 100.0 + i * DT
        if full:
            records.append(msg_record(2, t - 1e-4, ser_imu(t - 1e-4)))
            records.append(msg_record(3, t - 1e-4, ser_odometry(
                t - 1e-4, lin=(V_TRUE[0], V_TRUE[1], 0.0))))
            records.append(msg_record(4, t - 1e-4, ser_height(t - 1e-4, HEIGHT)))
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        records.append(msg_record(0, t, ser_image(t, frame)))
    return write_bag(tmp_path / "flight.bag", records, compression)


def _replay(path, **kw):
    published = []
    node = OpticFlowNode(load_config(), publish=lambda t, m: published.append((t, m)),
                         log=lambda s: None)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    frames = replay_bag(node, path, **kw)
    twists = [m for t, m in published if t == "velocity_out"]
    return frames, twists


@pytest.mark.slow
def test_replay_full_flight(tmp_path):
    """All five topics recorded: the node recovers the true velocity from
    the bag alone, like the live graph would feed it."""
    path = _flight_bag(tmp_path, full=True, compression="bz2")
    frames, twists = _replay(path)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


def test_replay_image_only_bag(tmp_path):
    """A bare camera bag still replays: camera info is synthesized from the
    first frame's geometry and IMU/odometry/height get level-flight
    defaults (the .ofrec replay convention)."""
    path = _flight_bag(tmp_path, full=False)
    frames, twists = _replay(path, default_height=HEIGHT)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


@pytest.mark.slow
def test_replay_limit(tmp_path):
    path = _flight_bag(tmp_path, full=False, n_frames=5)
    frames, _ = _replay(path, limit=2)
    assert frames == 2


@pytest.mark.slow
def test_cli_replay_bag(tmp_path, capsys):
    from mrs_optic_flow_tpu.__main__ import main

    path = _flight_bag(tmp_path, full=True)
    rc = main(["--replay", path, "--height", str(HEIGHT)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "twists from 6 replay frames" in out


def test_truncated_bag_raises(tmp_path):
    """Corrupt/truncated containers surface BagFormatError, never a raw
    struct/index crash."""
    img = np.zeros((4, 4), np.uint8)
    records = [
        conn_record(0, "/cam/image_raw", "sensor_msgs/Image"),
        msg_record(0, 10.0, ser_image(10.0, img)),
    ]
    path = write_bag(tmp_path / "whole.bag", records)
    whole = open(path, "rb").read()
    for cut in (len(whole) - 7, len(MAGIC) + 2, len(whole) // 2):
        p = tmp_path / f"cut{cut}.bag"
        p.write_bytes(whole[:cut])
        with pytest.raises(BagFormatError):
            list(BagReader(str(p)).messages())


def test_lz4_without_module_raises(tmp_path):
    """An lz4-compressed bag on a host without the lz4 module fails with
    the actionable message, not an ImportError traceback."""
    try:
        import lz4  # noqa: F401

        pytest.skip("lz4 present; the error path is for hosts without it")
    except ImportError:
        pass
    records = [conn_record(0, "/cam/image_raw", "sensor_msgs/Image")]
    chunk = b"".join(records + [msg_record(0, 1.0, ser_image(1.0, np.zeros((2, 2), np.uint8)))])
    out = MAGIC + _record(
        {"op": b"\x05", "compression": b"lz4", "size": struct.pack("<I", len(chunk))},
        b"\x00" * 16,
    )
    p = tmp_path / "lz4.bag"
    p.write_bytes(out)
    with pytest.raises(BagFormatError, match="lz4"):
        list(BagReader(str(p)).messages())


@pytest.mark.slow
def test_decode_compressed_image(tmp_path):
    """sensor_msgs/CompressedImage: png-encoded frames decode through cv2
    and replay like raw Image topics."""
    cv2 = pytest.importorskip("cv2")
    from mrs_optic_flow_tpu.runtime.rosbag import decode_compressed_image_msg

    img = np.arange(32 * 48, dtype=np.uint8).reshape(32, 48)
    ok, enc = cv2.imencode(".png", img)
    assert ok
    payload = (
        _header(5.5) + _string("png")
        + struct.pack("<I", len(enc)) + enc.tobytes()
    )
    msg = decode_compressed_image_msg(payload)
    assert msg.stamp == pytest.approx(5.5)
    np.testing.assert_array_equal(msg.data, img)

    # a compressed-camera bag end-to-end: same flight, png frames
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    records = [conn_record(0, "/uav1/bluefox_optflow/image_raw/compressed",
                           "sensor_msgs/CompressedImage")]
    for i in range(4):
        t = 100.0 + i * DT
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", frame)
        records.append(msg_record(0, t, _header(t) + _string("png")
                                  + struct.pack("<I", len(enc)) + enc.tobytes()))
    path = write_bag(tmp_path / "compressed.bag", records)
    frames, twists = _replay(path, default_height=HEIGHT)
    assert frames == 4 and len(twists) >= 2
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


@pytest.mark.slow
def test_cli_bag_topic_pins_role(tmp_path, capsys):
    """--bag-topic image=... resolves an ambiguous two-camera bag."""
    from mrs_optic_flow_tpu.__main__ import main

    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    records = [
        conn_record(0, "/uav1/front/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/uav1/down/image_raw", "sensor_msgs/Image"),
    ]
    for i in range(4):
        t = 100.0 + i * DT
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        records.append(msg_record(1, t, ser_image(t, frame)))
        # the distractor camera publishes black frames
        records.append(msg_record(0, t, ser_image(
            t, np.zeros((8, 8), np.uint8))))
    path = write_bag(tmp_path / "two_cams.bag", records)

    with pytest.raises(BagFormatError, match="several sensor_msgs/Image"):
        main(["--replay", path, "--height", str(HEIGHT)])

    rc = main(["--replay", path, "--height", str(HEIGHT),
               "--bag-topic", "image=/uav1/down/image_raw"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "twists from 4 replay frames" in out


def test_topics_scan_skips_chunks(tmp_path):
    """Real rosbags repeat every connection record at top level after the
    chunks (the index section); topics_by_type must resolve from those
    without decompressing a chunk.  Proven with a bag whose chunk blob is
    corrupt: topic resolution succeeds, message iteration raises."""
    import os

    conns = [
        conn_record(0, "/cam/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/odom", "nav_msgs/Odometry"),
    ]
    out = MAGIC
    out += _record(
        {"op": b"\x05", "compression": b"bz2",
         "size": struct.pack("<I", 64)},
        b"\x13\x37" * 8,  # not bz2
    )
    out += b"".join(conns)  # the post-chunk connection section
    p = tmp_path / "fastpath.bag"
    p.write_bytes(out)

    reader = BagReader(str(p))
    by_type = reader.topics_by_type()
    assert by_type["sensor_msgs/Image"] == ["/cam/image_raw"]
    assert by_type["nav_msgs/Odometry"] == ["/odom"]
    with pytest.raises(Exception):  # noqa: B017 — bz2 garbage
        list(reader.messages())
    reader.close()
    assert os.path.exists(p)  # close released the mmap without unlinking


def test_raw_beats_compressed_auto(tmp_path):
    """image_transport records raw + compressed side by side; replay must
    pick ONE camera stream (raw wins on auto-resolve; an explicit
    compressed pin flips it) instead of double-dispatching every frame."""
    cv2 = pytest.importorskip("cv2")
    img = np.full((8, 8), 9, np.uint8)
    ok, enc = cv2.imencode(".png", img)
    records = [
        conn_record(0, "/cam/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/cam/image_raw/compressed", "sensor_msgs/CompressedImage"),
    ]
    for i in range(3):
        t = 100.0 + i * DT
        records.append(msg_record(0, t, ser_image(t, img)))
        records.append(msg_record(1, t, _header(t) + _string("png")
                                  + struct.pack("<I", len(enc)) + enc.tobytes()))
    path = write_bag(tmp_path / "both.bag", records)

    routing = resolve_topics(BagReader(path))
    assert set(routing) == {"/cam/image_raw"}

    routing = resolve_topics(
        BagReader(path), {"compressed_image": "/cam/image_raw/compressed"}
    )
    assert set(routing) == {"/cam/image_raw/compressed"}

    frames, _ = _replay(path, default_height=HEIGHT)
    assert frames == 3  # one dispatch per physical frame, not two


def test_pinned_topic_must_exist(tmp_path):
    records = [conn_record(0, "/cam/image_raw", "sensor_msgs/Image")]
    path = write_bag(tmp_path / "one.bag", records)
    with pytest.raises(BagFormatError, match="not in the bag"):
        resolve_topics(BagReader(path), {"image": "/cam/image_row"})  # typo


def test_replay_truncated_raises_bagformat(tmp_path):
    """A truncation surfacing mid-replay must raise the actionable
    BagFormatError, not a BufferError from the mmap close."""
    img = np.zeros((8, 8), np.uint8)
    records = [
        conn_record(0, "/cam/image_raw", "sensor_msgs/Image"),
        msg_record(0, 100.0, ser_image(100.0, img)),
        msg_record(0, 100.05, ser_image(100.05, img)),
    ]
    path = _p = write_bag(tmp_path / "whole.bag", records)
    whole = open(path, "rb").read()
    cut = tmp_path / "cut.bag"
    cut.write_bytes(whole[: len(whole) - 9])
    from mrs_optic_flow_tpu.runtime import OpticFlowNode

    node = OpticFlowNode(load_config(), publish=lambda t, m: None,
                         log=lambda s: None)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    with pytest.raises(BagFormatError):
        replay_bag(node, str(cut), default_height=HEIGHT)


def test_cli_bag_topic_malformed_errors(tmp_path, capsys):
    from mrs_optic_flow_tpu.__main__ import main

    records = [conn_record(0, "/cam/image_raw", "sensor_msgs/Image")]
    path = write_bag(tmp_path / "one.bag", records)
    with pytest.raises(SystemExit):
        main(["--replay", path, "--bag-topic", "image"])
    assert "ROLE=TOPIC" in capsys.readouterr().err


def test_cli_bag_info(tmp_path, capsys):
    from mrs_optic_flow_tpu.__main__ import main

    img = np.zeros((4, 4), np.uint8)
    records = [
        conn_record(0, "/uav1/bluefox_optflow/image_raw", "sensor_msgs/Image"),
        conn_record(1, "/uav1/odometry/height", "mrs_msgs/Float64Stamped"),
        conn_record(2, "/uav1/silent", "std_msgs/Empty"),  # no messages
        msg_record(0, 10.0, ser_image(10.0, img)),
        msg_record(0, 10.5, ser_image(10.5, img)),
        msg_record(1, 12.0, ser_height(12.0, 2.0)),
    ]
    path = write_bag(tmp_path / "info.bag", records, "bz2")
    rc = main(["--bag-info", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 messages, 2.00 s" in out
    assert "/uav1/bluefox_optflow/image_raw" in out and "sensor_msgs/Image" in out
    assert "/uav1/silent" in out and "      0" in out


# ------------------------------------------------------------------ #
# tf from the bag (/tf_static) — the offline timerTf                  #
# ------------------------------------------------------------------ #


def ser_tf(transforms):
    """tf2_msgs/TFMessage: [(parent, child, quat xyzw)] -> wire bytes."""
    out = struct.pack("<I", len(transforms))
    for parent, child, q in transforms:
        out += struct.pack("<III", 0, 100, 0)  # header: seq + stamp
        out += _string(parent) + _string(child)
        out += struct.pack("<3d", 0.0, 0.0, 0.0)  # translation (unused)
        out += struct.pack("<4d", *q)
    return out


def test_decode_tf_message():
    from mrs_optic_flow_tpu.runtime.rosbag import decode_tf_message

    q1, q2 = (0.0, 0.0, 0.3826834, 0.9238795), (0.1, 0.2, 0.3, 0.9273618)
    got = decode_tf_message(ser_tf([("uav1/fcu", "uav1/cam_link", q1),
                                    ("uav1/cam_link", "uav1/cam", q2)]))
    assert got[0][0] == "uav1/fcu" and got[0][1] == "uav1/cam_link"
    assert got[0][2] == pytest.approx(q1)
    assert got[1][2] == pytest.approx(q2)


def test_tf_tree_composes_chains():
    """lookup(target, source) composes rotations along the frame chain in
    either edge direction, like tf2's lookupTransform."""
    from mrs_optic_flow_tpu.runtime.rosbag import TfTree
    from mrs_optic_flow_tpu.utils import np_quat_inverse, np_quat_multiply

    rng = np.random.default_rng(11)
    def rand_q():
        q = rng.standard_normal(4)
        return q / np.linalg.norm(q)

    q1, q2 = rand_q(), rand_q()
    tree = TfTree()
    tree.add("fcu", "link", q1)     # v_fcu  = R(q1) v_link
    tree.add("link", "cam", q2)     # v_link = R(q2) v_cam
    got = tree.lookup("fcu", "cam")  # v_fcu = R(q1 q2) v_cam
    want = np_quat_multiply(np.asarray(q1), np.asarray(q2))
    assert np.abs(got - want).max() < 1e-12 or np.abs(got + want).max() < 1e-12

    inv = tree.lookup("cam", "fcu")
    winv = np_quat_inverse(want)
    assert np.abs(inv - winv).max() < 1e-12 or np.abs(inv + winv).max() < 1e-12

    assert tree.lookup("fcu", "fcu") == pytest.approx([0, 0, 0, 1])
    assert tree.lookup("fcu", "nowhere") is None


@pytest.mark.slow
def test_replay_tf_from_bag(tmp_path):
    """camera->body resolves from /tf_static via a two-hop chain; without
    the frames the node stays gated on transforms (nothing publishes)."""
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    ident = (0.0, 0.0, 0.0, 1.0)
    records = [
        conn_record(0, "/uav1/bluefox_optflow/image_raw", "sensor_msgs/Image"),
        conn_record(5, "/tf_static", "tf2_msgs/TFMessage"),
        msg_record(5, 99.0, ser_tf([("uav1/fcu", "uav1/cam_link", ident),
                                    ("uav1/cam_link", "uav1/cam", ident)])),
    ]
    for i in range(5):
        t = 100.0 + i * DT
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        records.append(msg_record(0, t, ser_image(t, frame)))
    path = write_bag(tmp_path / "tf_flight.bag", records)

    published = []
    node = OpticFlowNode(load_config(), publish=lambda t, m: published.append((t, m)),
                         log=lambda s: None)
    # NOTE: no set_transforms here — the bag provides them
    frames = replay_bag(node, path, default_height=HEIGHT,
                        camera_frame="uav1/cam", uav_frame="uav1/fcu")
    assert node.got_tfs and frames == 5
    np.testing.assert_allclose(node.c2b_quat, ident, atol=1e-12)
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v

    # frames that never resolve -> the node stays gated, publishes nothing
    published2 = []
    node2 = OpticFlowNode(load_config(), publish=lambda t, m: published2.append((t, m)),
                          log=lambda s: None)
    replay_bag(node2, path, default_height=HEIGHT,
               camera_frame="uav1/elsewhere", uav_frame="uav1/fcu")
    assert not node2.got_tfs and not published2
