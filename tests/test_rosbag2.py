"""ROS2 rosbag2 replay (runtime/rosbag2.py): sqlite3 storage parsing, CDR
message decoding, role resolution, and end-to-end node replay.

The serializers here are an independent test-side CDR implementation
(explicit alignment bookkeeping) so a decoder bug cannot cancel against a
mirrored encoder bug.
"""

import sqlite3
import struct

import numpy as np
import pytest

from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime.node import OpticFlowNode
from mrs_optic_flow_tpu.runtime.rosbag2 import (
    Bag2FormatError,
    Bag2Reader,
    decode_camera_info_msg,
    decode_float64_stamped_msg,
    decode_image_msg,
    decode_imu_msg,
    decode_odometry_msg,
    decode_tf_message,
    is_rosbag2,
    replay_bag2,
)
from mrs_optic_flow_tpu.runtime.stream import SyntheticScene

# ------------------------------------------------------------------ #
# test-side CDR serializer                                            #
# ------------------------------------------------------------------ #


class _W:
    """CDR writer: encapsulation header + size-aligned primitives."""

    def __init__(self, endian="<"):
        self.e = endian
        self.b = bytearray(b"\x00\x01\x00\x00" if endian == "<"
                           else b"\x00\x00\x00\x00")

    def align(self, n):
        self.b += b"\x00" * ((-(len(self.b) - 4)) % n)

    def u8(self, v):
        self.b += struct.pack(self.e + "B", v)

    def u32(self, v):
        self.align(4)
        self.b += struct.pack(self.e + "I", v)

    def i32(self, v):
        self.align(4)
        self.b += struct.pack(self.e + "i", v)

    def f64(self, v):
        self.align(8)
        self.b += struct.pack(self.e + "d", v)

    def f64s(self, vs):
        self.align(8)
        self.b += struct.pack(f"{self.e}{len(vs)}d", *vs)

    def string(self, s):
        data = s.encode() + b"\x00"
        self.u32(len(data))
        self.b += data

    def bytes_seq(self, data):
        self.u32(len(data))
        self.b += bytes(data)

    def time(self, t):
        sec = int(t)
        self.i32(sec)
        self.u32(int(round((t - sec) * 1e9)))

    def header(self, stamp, frame=""):
        self.time(stamp)
        self.string(frame)

    def done(self):
        return bytes(self.b)


def ser_image(stamp, img, step_pad=0, endian="<"):
    w = _W(endian)
    w.header(stamp, "cam")
    h, wd = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    step = wd * ch + step_pad
    w.u32(h)
    w.u32(wd)
    w.string("mono8" if ch == 1 else "bgr8")
    w.u8(0)
    w.u32(step)
    rows = np.zeros((h, step), np.uint8)
    rows[:, : wd * ch] = img.reshape(h, wd * ch)
    w.bytes_seq(rows.tobytes())
    return w.done()


def ser_camera_info(stamp, k, d, binning_x=0, endian="<"):
    w = _W(endian)
    w.header(stamp, "cam")
    w.u32(480)
    w.u32(480)
    w.string("plumb_bob")
    w.u32(len(d))
    w.f64s(list(d))
    w.f64s(list(k))
    w.f64s([0.0] * 9)  # r
    w.f64s([0.0] * 12)  # p
    w.u32(binning_x)
    w.u32(0)  # binning_y
    return w.done()


def ser_imu(stamp, quat=(0.0, 0.0, 0.0, 1.0), ang=(0.0, 0.0, 0.0)):
    w = _W()
    w.header(stamp, "imu")
    w.f64s(list(quat))
    w.f64s([0.0] * 9)
    w.f64s(list(ang))
    w.f64s([0.0] * 9)
    w.f64s([0.0, 0.0, 9.81])
    w.f64s([0.0] * 9)
    return w.done()


def ser_odometry(stamp, quat=(0.0, 0.0, 0.0, 1.0), lin=(0.0, 0.0, 0.0),
                 ang=(0.0, 0.0, 0.0)):
    w = _W()
    w.header(stamp, "odom")
    w.string("base")
    w.f64s([0.0, 0.0, 0.0])  # position
    w.f64s(list(quat))
    w.f64s([0.0] * 36)
    w.f64s(list(lin))
    w.f64s(list(ang))
    w.f64s([0.0] * 36)
    return w.done()


def ser_height(stamp, v):
    w = _W()
    w.header(stamp, "odom")
    w.f64(v)
    return w.done()


def ser_tf(transforms):
    """``[(parent, child, quat xyzw), ...]`` -> tf2_msgs/msg/TFMessage."""
    w = _W()
    w.u32(len(transforms))
    for parent, child, quat in transforms:
        w.time(1.0)
        w.string(parent)
        w.string(child)
        w.f64s([0.1, -0.2, 0.3])  # translation (ignored by the decoder)
        w.f64s(list(quat))
    return w.done()


# ------------------------------------------------------------------ #
# sqlite3 storage writer                                              #
# ------------------------------------------------------------------ #


def write_db3(path, topics, messages):
    """``topics``: ``[(id, name, type)]``; ``messages``:
    ``[(t_s, topic_id, payload)]`` (insertion order = id order)."""
    con = sqlite3.connect(str(path))
    con.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT NOT NULL, "
        "type TEXT NOT NULL, serialization_format TEXT NOT NULL, "
        "offered_qos_profiles TEXT NOT NULL)"
    )
    con.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, "
        "topic_id INTEGER NOT NULL, timestamp INTEGER NOT NULL, "
        "data BLOB NOT NULL)"
    )
    for tid, name, type_name in topics:
        con.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                    (tid, name, type_name, "cdr", ""))
    for i, (t, tid, payload) in enumerate(messages):
        con.execute("INSERT INTO messages VALUES (?,?,?,?)",
                    (i + 1, tid, int(round(t * 1e9)), payload))
    con.commit()
    con.close()
    return str(path)


# ------------------------------------------------------------------ #
# test-side MCAP writer                                               #
# ------------------------------------------------------------------ #

_MCAP_MAGIC = b"\x89MCAP0\r\n"


def _mrec(op, payload):
    return bytes([op]) + struct.pack("<Q", len(payload)) + payload


def _mstr(s):
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def mcap_schema(sid, name):
    return _mrec(0x03, struct.pack("<H", sid) + _mstr(name)
                 + _mstr("ros2msg") + struct.pack("<I", 0))


def mcap_channel(cid, sid, topic, encoding="cdr"):
    return _mrec(0x04, struct.pack("<HH", cid, sid) + _mstr(topic)
                 + _mstr(encoding) + struct.pack("<I", 0))


def mcap_message(cid, t, payload):
    ns = int(round(t * 1e9))
    return _mrec(0x05, struct.pack("<HIQQ", cid, 0, ns, ns) + payload)


def mcap_chunk(records, compression="none", comp_bytes=None):
    data = b"".join(records)
    comp = data if comp_bytes is None else comp_bytes
    payload = (struct.pack("<QQQI", 0, 0, len(data), 0)
               + _mstr(compression) + struct.pack("<Q", len(comp)) + comp)
    return _mrec(0x06, payload)


def write_mcap(path, records, summary=None):
    """``summary``: optional records repeated in a summary section, with
    the footer's summary_start pointing at it (the real writers' shape)."""
    header = _mrec(0x01, _mstr("ros2") + _mstr("test-writer"))
    data_end = _mrec(0x0F, struct.pack("<I", 0))
    body = _MCAP_MAGIC + header + b"".join(records) + data_end
    summary_start = len(body) if summary else 0
    if summary:
        body += b"".join(summary)
    footer = _mrec(0x02, struct.pack("<QQI", summary_start, 0, 0))
    with open(path, "wb") as fh:
        fh.write(body + footer + _MCAP_MAGIC)
    return str(path)


# ------------------------------------------------------------------ #
# decoders                                                            #
# ------------------------------------------------------------------ #


def test_decode_image_respects_stride():
    img = np.arange(12 * 7, dtype=np.uint8).reshape(12, 7)
    msg = decode_image_msg(ser_image(4.25, img, step_pad=3))
    assert msg.stamp == pytest.approx(4.25)
    np.testing.assert_array_equal(msg.data, img)


def test_decode_image_big_endian():
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    msg = decode_image_msg(ser_image(1.5, img, endian=">"))
    np.testing.assert_array_equal(msg.data, img)


def test_decode_camera_info():
    k = [420.0, 0, 240, 0, 421.0, 241, 0, 0, 1]
    ci = decode_camera_info_msg(ser_camera_info(2.0, k, [0.1, 0.2, 0, 0, 0],
                                                binning_x=2))
    assert list(ci.k) == k
    assert list(ci.d) == [0.1, 0.2, 0, 0, 0]
    assert ci.binning_x == 2


def test_decode_camera_info_empty_d():
    ci = decode_camera_info_msg(ser_camera_info(2.0, [1.0] * 9, []))
    assert list(ci.d) == [0.0] * 5


def test_decode_imu_odometry_height():
    imu = decode_imu_msg(ser_imu(3.0, quat=(0, 0, 0.7071, 0.7071),
                                 ang=(0.1, -0.2, 0.3)))
    assert imu.stamp == pytest.approx(3.0)
    assert imu.angular_velocity == pytest.approx((0.1, -0.2, 0.3))
    assert imu.orientation[2] == pytest.approx(0.7071)

    odo = decode_odometry_msg(ser_odometry(3.5, lin=(1.0, 2.0, 3.0),
                                           ang=(0.0, 0.0, 0.5)))
    assert odo.stamp == pytest.approx(3.5)
    assert odo.linear_velocity == pytest.approx((1.0, 2.0, 3.0))
    assert odo.angular_velocity[2] == pytest.approx(0.5)

    h = decode_float64_stamped_msg(ser_height(4.0, 2.5))
    assert (h.stamp, h.value) == (pytest.approx(4.0), pytest.approx(2.5))


def test_decode_tf_message():
    tfs = decode_tf_message(ser_tf([
        ("uav1/fcu", "uav1/cam", (0.0, 0.0, 0.0, 1.0)),
        ("world", "uav1/fcu", (0.0, 0.7071, 0.0, 0.7071)),
    ]))
    assert [(p, c) for p, c, _ in tfs] == [
        ("uav1/fcu", "uav1/cam"), ("world", "uav1/fcu")]
    assert tfs[1][2][1] == pytest.approx(0.7071)


def test_xcdr2_encapsulation_rejected():
    payload = b"\x00\x07\x00\x00" + b"\x00" * 16  # XCDR2 DELIMITED_CDR LE
    with pytest.raises(Bag2FormatError, match="encapsulation"):
        decode_imu_msg(payload)


def test_truncated_cdr_raises():
    whole = ser_imu(3.0)
    # cut inside the orientation quaternion — decode_imu consumes only a
    # prefix of the message, so the cut must land inside the CONSUMED part
    with pytest.raises(Bag2FormatError, match="truncated"):
        decode_imu_msg(whole[:30])
    with pytest.raises(Bag2FormatError, match="truncated"):
        decode_image_msg(ser_image(1.0, np.zeros((4, 4), np.uint8))[:-8])


# ------------------------------------------------------------------ #
# reader                                                              #
# ------------------------------------------------------------------ #


def test_reader_roundtrip(tmp_path):
    img = np.zeros((4, 4), np.uint8)
    path = write_db3(
        tmp_path / "flight.db3",
        [(1, "/cam/image_raw", "sensor_msgs/msg/Image"),
         (2, "/odom", "nav_msgs/msg/Odometry")],
        [(10.0, 1, ser_image(10.0, img)),
         (10.01, 2, ser_odometry(10.01)),
         (10.05, 1, ser_image(10.05, img))],
    )
    with Bag2Reader(path) as r:
        msgs = list(r.messages())
    assert [(round(t, 3), topic) for t, topic, _, _ in msgs] == [
        (10.0, "/cam/image_raw"), (10.01, "/odom"), (10.05, "/cam/image_raw")]
    assert msgs[0][2] == "sensor_msgs/msg/Image"
    assert r.topics_by_type() == {
        "sensor_msgs/msg/Image": ["/cam/image_raw"],
        "nav_msgs/msg/Odometry": ["/odom"],
    }


def test_directory_split_bags(tmp_path):
    """A bag directory with split .db3 files replays them in
    metadata.yaml's relative_file_paths order."""
    bag = tmp_path / "flight"
    bag.mkdir()
    img = np.zeros((4, 4), np.uint8)
    topics = [(1, "/cam/image_raw", "sensor_msgs/msg/Image")]
    # name order (a_, b_) deliberately contradicts the metadata order
    write_db3(bag / "b_0.db3", topics, [(10.0, 1, ser_image(10.0, img))])
    write_db3(bag / "a_1.db3", topics, [(11.0, 1, ser_image(11.0, img))])
    (bag / "metadata.yaml").write_text(
        "rosbag2_bagfile_information:\n"
        "  relative_file_paths:\n    - b_0.db3\n    - a_1.db3\n"
    )
    with Bag2Reader(str(bag)) as r:
        times = [round(t, 3) for t, _, _, _ in r.messages()]
    assert times == [10.0, 11.0]


def test_split_bags_natural_sort_without_metadata(tmp_path):
    """rosbag2 names split files <bag>_<N>.db3; without metadata.yaml the
    fallback ordering must be numeric (lexicographic puts _10 before _2,
    replaying minutes out of order)."""
    bag = tmp_path / "long"
    bag.mkdir()
    img = np.zeros((4, 4), np.uint8)
    topics = [(1, "/cam", "sensor_msgs/msg/Image")]
    for i in (0, 1, 2, 10, 11):
        write_db3(bag / f"long_{i}.db3", topics,
                  [(100.0 + i, 1, ser_image(100.0 + i, img))])
    with Bag2Reader(str(bag)) as r:
        times = [round(t, 3) for t, _, _, _ in r.messages()]
    assert times == [100.0, 101.0, 102.0, 110.0, 111.0]


def test_is_rosbag2(tmp_path):
    assert is_rosbag2("x/flight.db3")
    assert not is_rosbag2("x/flight.bag")
    bag = tmp_path / "dir_bag"
    bag.mkdir()
    assert not is_rosbag2(str(bag))
    (bag / "metadata.yaml").write_text("{}")
    assert is_rosbag2(str(bag))


def test_not_a_database_raises(tmp_path):
    p = tmp_path / "junk.db3"
    p.write_bytes(b"definitely not sqlite" * 10)
    with pytest.raises(Bag2FormatError, match="sqlite3"):
        Bag2Reader(str(p))


def test_missing_file_raises(tmp_path):
    with pytest.raises(Bag2FormatError, match="no such file"):
        Bag2Reader(str(tmp_path / "absent.db3"))


def test_non_cdr_serialization_rejected(tmp_path):
    p = tmp_path / "pb.db3"
    con = sqlite3.connect(str(p))
    con.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                "type TEXT, serialization_format TEXT, "
                "offered_qos_profiles TEXT)")
    con.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id "
                "INTEGER, timestamp INTEGER, data BLOB)")
    con.execute("INSERT INTO topics VALUES (1, '/x', 'std_msgs/msg/Empty', "
                "'protobuf', '')")
    con.commit()
    con.close()
    with pytest.raises(Bag2FormatError, match="serialization"):
        Bag2Reader(str(p))


def test_empty_directory_raises(tmp_path):
    bag = tmp_path / "empty"
    bag.mkdir()
    (bag / "metadata.yaml").write_text("{}")
    with pytest.raises(Bag2FormatError, match="no .db3"):
        Bag2Reader(str(bag))


# ------------------------------------------------------------------ #
# MCAP storage                                                        #
# ------------------------------------------------------------------ #


def test_mcap_roundtrip_chunked_and_bare(tmp_path):
    """Schema/channel resolution and message streaming, for messages both
    inside an uncompressed chunk and at top level."""
    img = np.zeros((4, 4), np.uint8)
    path = write_mcap(tmp_path / "flight.mcap", [
        mcap_chunk([
            mcap_schema(1, "sensor_msgs/msg/Image"),
            mcap_channel(1, 1, "/cam/image_raw"),
            mcap_message(1, 10.0, ser_image(10.0, img)),
        ]),
        mcap_schema(2, "nav_msgs/msg/Odometry"),
        mcap_channel(2, 2, "/odom"),
        mcap_message(2, 10.01, ser_odometry(10.01)),
        mcap_message(1, 10.05, ser_image(10.05, img)),
    ])
    with Bag2Reader(path) as r:
        msgs = list(r.messages())
    assert [(round(t, 3), topic, tn) for t, topic, tn, _ in msgs] == [
        (10.0, "/cam/image_raw", "sensor_msgs/msg/Image"),
        (10.01, "/odom", "nav_msgs/msg/Odometry"),
        (10.05, "/cam/image_raw", "sensor_msgs/msg/Image"),
    ]
    assert r.topics_by_type()["sensor_msgs/msg/Image"] == ["/cam/image_raw"]
    # decoded payloads round-trip
    assert decode_odometry_msg(msgs[1][3]).stamp == pytest.approx(10.01)


def test_mcap_summary_section_topic_discovery(tmp_path):
    """Real mcap writers put channels inside compressed chunks and repeat
    them in the summary section; topic discovery must resolve from the
    summary (footer summary_start) without decompressing any chunk."""
    img = np.zeros((4, 4), np.uint8)
    schema = mcap_schema(1, "sensor_msgs/msg/Image")
    channel = mcap_channel(1, 1, "/cam/image_raw")
    path = write_mcap(
        tmp_path / "s.mcap",
        [mcap_chunk([schema, channel,
                     mcap_message(1, 10.0, ser_image(10.0, img))],
                    compression="snappy",  # undecompressable on purpose:
                    comp_bytes=b"junk")],  # discovery must not descend
        summary=[schema, channel],
    )
    with Bag2Reader(path) as r:
        assert r.topics_by_type() == {
            "sensor_msgs/msg/Image": ["/cam/image_raw"]}
        # replaying DOES descend and surfaces the compression error
        with pytest.raises(Bag2FormatError, match="compression"):
            list(r.messages())


def test_mcap_zstd_chunk(tmp_path):
    """rosbag2's mcap writer compresses chunks with zstd by default; a
    zstd chunk round-trips when a zstd module exists, and raises the
    gating error otherwise (the ROS1 reader's lz4 convention)."""
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    inner = [
        mcap_schema(1, "sensor_msgs/msg/Image"),
        mcap_channel(1, 1, "/cam"),
        mcap_message(1, 5.0, ser_image(5.0, img)),
    ]
    try:
        import zstandard
    except ImportError:
        path = write_mcap(tmp_path / "z.mcap", [
            mcap_chunk(inner, compression="zstd",
                       comp_bytes=b"\x28\xb5\x2f\xfd junk"),
        ])
        with pytest.raises(Bag2FormatError, match="zstd"):
            Bag2Reader(path)
        return
    comp = zstandard.ZstdCompressor().compress(b"".join(inner))
    path = write_mcap(tmp_path / "z.mcap", [
        mcap_chunk(inner, compression="zstd", comp_bytes=comp),
    ])
    with Bag2Reader(path) as r:
        msgs = list(r.messages())
    assert len(msgs) == 1 and msgs[0][1] == "/cam"
    np.testing.assert_array_equal(decode_image_msg(msgs[0][3]).data, img)


def test_mcap_unknown_compression_raises(tmp_path):
    path = write_mcap(tmp_path / "s.mcap", [
        mcap_chunk([mcap_schema(1, "x"), mcap_channel(1, 1, "/t")],
                   compression="snappy", comp_bytes=b"junk"),
    ])
    with pytest.raises(Bag2FormatError, match="compression"):
        Bag2Reader(path)


def test_mcap_bad_magic_and_truncation(tmp_path):
    p = tmp_path / "bad.mcap"
    p.write_bytes(b"not an mcap file at all")
    with pytest.raises(Bag2FormatError, match="magic"):
        Bag2Reader(str(p))

    good = write_mcap(tmp_path / "good.mcap", [
        mcap_schema(1, "sensor_msgs/msg/Image"),
        mcap_channel(1, 1, "/cam"),
        mcap_message(1, 1.0, ser_image(1.0, np.zeros((4, 4), np.uint8))),
    ])
    whole = open(good, "rb").read()
    trunc = tmp_path / "trunc.mcap"
    trunc.write_bytes(whole[: len(whole) // 2])
    with pytest.raises(Bag2FormatError, match="truncated"):
        Bag2Reader(str(trunc))


def test_mcap_non_cdr_channel_rejected(tmp_path):
    path = write_mcap(tmp_path / "pb.mcap", [
        mcap_schema(1, "foo/msg/Bar"),
        mcap_channel(1, 1, "/t", encoding="protobuf"),
    ])
    with pytest.raises(Bag2FormatError, match="serialization"):
        Bag2Reader(path)


def test_mcap_magic_sniff_beats_extension(tmp_path):
    """A .db3-named file with MCAP content reads as MCAP (content sniff)."""
    img = np.zeros((4, 4), np.uint8)
    mcap_bytes = open(write_mcap(tmp_path / "x.mcap", [
        mcap_schema(1, "sensor_msgs/msg/Image"),
        mcap_channel(1, 1, "/cam"),
        mcap_message(1, 2.0, ser_image(2.0, img)),
    ]), "rb").read()
    disguised = tmp_path / "disguised.db3"
    disguised.write_bytes(mcap_bytes)
    with Bag2Reader(str(disguised)) as r:
        assert len(list(r.messages())) == 1


def test_mcap_directory_mixed_with_db3(tmp_path):
    """A split bag can mix storage flavors; replay follows metadata order."""
    bag = tmp_path / "flight"
    bag.mkdir()
    img = np.zeros((4, 4), np.uint8)
    write_db3(bag / "part1.db3",
              [(1, "/cam", "sensor_msgs/msg/Image")],
              [(10.0, 1, ser_image(10.0, img))])
    write_mcap(bag / "part2.mcap", [
        mcap_schema(1, "sensor_msgs/msg/Image"),
        mcap_channel(1, 1, "/cam"),
        mcap_message(1, 11.0, ser_image(11.0, img)),
    ])
    (bag / "metadata.yaml").write_text(
        "rosbag2_bagfile_information:\n"
        "  relative_file_paths:\n    - part1.db3\n    - part2.mcap\n"
    )
    with Bag2Reader(str(bag)) as r:
        times = [round(t, 3) for t, _, _, _ in r.messages()]
    assert times == [10.0, 11.0]
    assert is_rosbag2(str(bag))
    assert is_rosbag2("whatever.mcap")


# ------------------------------------------------------------------ #
# end-to-end replay                                                   #
# ------------------------------------------------------------------ #

V_TRUE = (0.8, -0.5)
HEIGHT = 2.0
DT = 0.05


def _flight_db3(tmp_path, *, full: bool, n_frames: int = 6):
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    topics = [(1, "/uav1/camera/image_raw", "sensor_msgs/msg/Image")]
    messages = []
    if full:
        topics += [
            (2, "/uav1/camera/camera_info", "sensor_msgs/msg/CameraInfo"),
            (3, "/uav1/imu/data", "sensor_msgs/msg/Imu"),
            (4, "/uav1/odometry", "nav_msgs/msg/Odometry"),
            (5, "/uav1/height", "mrs_msgs/msg/Float64Stamped"),
        ]
        messages.append((99.0, 2, ser_camera_info(
            99.0, [scene.fx, 0, scene.cx, 0, scene.fy, scene.cy, 0, 0, 1],
            [0.0] * 5)))
    for i in range(n_frames):
        t = 100.0 + i * DT
        if full:
            messages.append((t - 1e-4, 3, ser_imu(t - 1e-4)))
            messages.append((t - 1e-4, 4, ser_odometry(
                t - 1e-4, lin=(V_TRUE[0], V_TRUE[1], 0.0))))
            messages.append((t - 1e-4, 5, ser_height(t - 1e-4, HEIGHT)))
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        messages.append((t, 1, ser_image(t, frame)))
    return write_db3(tmp_path / "flight.db3", topics, messages)


def _replay(path, **kw):
    published = []
    node = OpticFlowNode(load_config(),
                         publish=lambda t, m: published.append((t, m)),
                         log=lambda s: None)
    if not (kw.get("camera_frame") and kw.get("uav_frame")):
        node.set_transforms((0.0, 0.0, 0.0, 1.0))
    frames = replay_bag2(node, path, **kw)
    twists = [m for t, m in published if t == "velocity_out"]
    return frames, twists


def test_replay_full_flight(tmp_path):
    """All five ROS2 topics recorded: the node recovers the true velocity
    from the bag alone — the rosbag2 twin of the ROS1 flight test."""
    path = _flight_db3(tmp_path, full=True)
    frames, twists = _replay(path)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


def test_replay_full_flight_mcap(tmp_path):
    """The same full flight through the MCAP storage flavor (messages in
    an uncompressed chunk, like rosbag2's mcap writer produces)."""
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    records = [
        mcap_schema(1, "sensor_msgs/msg/Image"),
        mcap_channel(1, 1, "/uav1/camera/image_raw"),
        mcap_schema(2, "sensor_msgs/msg/CameraInfo"),
        mcap_channel(2, 2, "/uav1/camera/camera_info"),
        mcap_message(2, 99.0, ser_camera_info(
            99.0, [scene.fx, 0, scene.cx, 0, scene.fy, scene.cy, 0, 0, 1],
            [0.0] * 5)),
    ]
    frames_recs = []
    for i in range(6):
        t = 100.0 + i * DT
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        frames_recs.append(mcap_message(1, t, ser_image(t, frame)))
    records.append(mcap_chunk(frames_recs))
    path = write_mcap(tmp_path / "flight.mcap", records)
    frames, twists = _replay(path, default_height=HEIGHT)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


def test_replay_image_only_bag(tmp_path):
    path = _flight_db3(tmp_path, full=False)
    frames, twists = _replay(path, default_height=HEIGHT)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


def test_replay_tf_from_bag(tmp_path):
    """camera->body resolves from /tf_static CDR messages through the
    shared TfTree chain composition (identity chain here: the recovered
    velocity must match the no-tf replay)."""
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    topics = [
        (1, "/uav1/camera/image_raw", "sensor_msgs/msg/Image"),
        (2, "/tf_static", "tf2_msgs/msg/TFMessage"),
    ]
    messages = [(99.0, 2, ser_tf([
        ("uav1/fcu", "uav1/link", (0.0, 0.0, 0.0, 1.0)),
        ("uav1/link", "uav1/cam", (0.0, 0.0, 0.0, 1.0)),
    ]))]
    for i in range(6):
        t = 100.0 + i * DT
        pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
        frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
        messages.append((t, 1, ser_image(t, frame)))
    path = write_db3(tmp_path / "tf.db3", topics, messages)
    frames, twists = _replay(path, default_height=HEIGHT,
                             camera_frame="uav1/cam", uav_frame="uav1/fcu")
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v


def test_height_accepts_std_msgs_variant(tmp_path):
    """std_msgs/msg/Float64Stamped (vendored type, same wire layout) binds
    the height role too."""
    img = np.zeros((4, 4), np.uint8)
    path = write_db3(
        tmp_path / "h.db3",
        [(1, "/cam", "sensor_msgs/msg/Image"),
         (2, "/h", "std_msgs/msg/Float64Stamped")],
        [(10.0, 2, ser_height(10.0, 3.0)),
         (10.01, 1, ser_image(10.01, img))],
    )
    node = OpticFlowNode(load_config(), publish=lambda t, m: None,
                         log=lambda s: None)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    replay_bag2(node, path)
    assert node.got_height
    assert node.uav_height == pytest.approx(3.0)


# ------------------------------------------------------------------ #
# CLI                                                                 #
# ------------------------------------------------------------------ #


@pytest.mark.slow
def test_cli_replay_db3(tmp_path, capsys):
    from mrs_optic_flow_tpu.__main__ import main

    path = _flight_db3(tmp_path, full=True)
    rc = main(["--replay", path, "--height", str(HEIGHT)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "twists from 6 replay frames" in out


def test_cli_bag_info_rosbag2(tmp_path, capsys):
    from mrs_optic_flow_tpu.__main__ import main

    path = _flight_db3(tmp_path, full=True)
    rc = main(["--bag-info", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sensor_msgs/msg/Image" in out
    assert "/uav1/camera/image_raw" in out


# ------------------------------------------------------------------ #
# Bag2Writer (sqlite3 storage + metadata.yaml + CDR encoders)         #
# ------------------------------------------------------------------ #
# The module decoders are validated above against the independent
# test-side serializer (_W), so round-tripping the writer's encoders
# through them checks the encoders against a known-good reference.


def test_bag2_encoders_roundtrip():
    from mrs_optic_flow_tpu.runtime import rosbag2 as rb2
    from mrs_optic_flow_tpu.runtime.msgs import (
        CameraInfo,
        Float64Stamped,
        ImageMsg,
        Imu,
        Odometry,
    )

    img = (np.arange(13 * 7, dtype=np.uint8).reshape(13, 7) * 3) % 251
    m = decode_image_msg(rb2.encode_image_msg(ImageMsg(stamp=4.25, data=img)))
    assert m.stamp == pytest.approx(4.25)
    np.testing.assert_array_equal(m.data, img)

    bgr = np.dstack([img, img + 1, img + 2]).astype(np.uint8)
    m = decode_image_msg(rb2.encode_image_msg(ImageMsg(stamp=1.0, data=bgr)))
    np.testing.assert_array_equal(m.data, bgr)

    k = [400.0, 0, 376, 0, 410.0, 240, 0, 0, 1]
    d = [0.1, -0.05, 0.001, 0.002, 0.01]
    info = decode_camera_info_msg(
        rb2.encode_camera_info_msg(
            CameraInfo(k=k, d=d, binning_x=2), 7.5, shape=(480, 752)
        )
    )
    assert list(info.k) == k and list(info.d) == d
    assert info.binning_x == 2

    imu = decode_imu_msg(rb2.encode_imu_msg(Imu(
        stamp=3.5, angular_velocity=(0.1, -0.2, 0.3),
        orientation=(0.0, 0.1, 0.0, 0.995))))
    assert imu.stamp == pytest.approx(3.5)
    assert tuple(imu.angular_velocity) == pytest.approx((0.1, -0.2, 0.3))
    assert tuple(imu.orientation) == pytest.approx((0.0, 0.1, 0.0, 0.995))

    odo = decode_odometry_msg(rb2.encode_odometry_msg(Odometry(
        stamp=9.0, orientation=(0, 0, 0.383, 0.924),
        linear_velocity=(1.5, -0.5, 0.1), angular_velocity=(0, 0, 0.2))))
    assert odo.stamp == pytest.approx(9.0)
    assert tuple(odo.linear_velocity) == pytest.approx((1.5, -0.5, 0.1))

    h = decode_float64_stamped_msg(rb2.encode_float64_stamped_msg(
        Float64Stamped(stamp=2.0, value=3.75)))
    assert (h.stamp, h.value) == (pytest.approx(2.0), pytest.approx(3.75))


def test_bag2_writer_reader_roundtrip(tmp_path):
    """Bag2Writer output is a directory Bag2Reader (and stock rosbag2
    layout expectations) open: metadata.yaml + one .db3 with the topics/
    messages/schema tables, messages in timestamp order."""
    from mrs_optic_flow_tpu.runtime.rosbag2 import Bag2Writer

    path = str(tmp_path / "written_bag")
    with Bag2Writer(path) as w:
        w.write("/b", "std_msgs/msg/String", 2.0, b"\x00\x01\x00\x00bb")
        w.write("/a", "std_msgs/msg/String", 1.0, b"\x00\x01\x00\x00aa")
        w.write("/a", "std_msgs/msg/String", 3.0, b"\x00\x01\x00\x00cc")

    assert is_rosbag2(path)
    meta = (tmp_path / "written_bag" / "metadata.yaml").read_text()
    assert "storage_identifier: sqlite3" in meta
    assert "written_bag_0.db3" in meta
    assert "message_count: 3" in meta

    with Bag2Reader(path) as r:
        topics = dict(r.topic_types)
        msgs = list(r.messages())
    assert topics == {"/a": "std_msgs/msg/String", "/b": "std_msgs/msg/String"}
    # storage yields timestamp order regardless of write order
    assert [(m[0], m[1]) for m in msgs] == [(1.0, "/a"), (2.0, "/b"), (3.0, "/a")]
    assert msgs[0][3].endswith(b"aa") and msgs[2][3].endswith(b"cc")

    # metadata.yaml parses as YAML (the reader honors relative_file_paths)
    import yaml

    info = yaml.safe_load(meta)["rosbag2_bagfile_information"]
    assert info["relative_file_paths"] == ["written_bag_0.db3"]
    assert info["message_count"] == 3
    assert {t["topic_metadata"]["name"]: t["message_count"]
            for t in info["topics_with_message_count"]} == {"/a": 2, "/b": 1}


@pytest.mark.slow
def test_bag2_writer_replay(tmp_path):
    """A flight written by Bag2Writer with the module's CDR encoders
    replays through the standard replay_bag2 path and recovers velocity —
    writer-side counterpart of test_replay_full_flight."""
    from mrs_optic_flow_tpu.runtime import rosbag2 as rb2
    from mrs_optic_flow_tpu.runtime.msgs import (
        Float64Stamped,
        ImageMsg,
        Imu,
        Odometry,
    )

    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    path = str(tmp_path / "wflight")
    with rb2.Bag2Writer(path) as w:
        w.write("/cam/camera_info", "sensor_msgs/msg/CameraInfo", 99.0,
                rb2.encode_camera_info_msg(scene.camera_info(), 99.0))
        for i in range(6):
            t = 100.0 + i * DT
            w.write("/imu", "sensor_msgs/msg/Imu", t - 1e-4,
                    rb2.encode_imu_msg(Imu(
                        stamp=t, angular_velocity=(0.0, 0.0, 0.0),
                        orientation=(0.0, 0.0, 0.0, 1.0))))
            w.write("/odom", "nav_msgs/msg/Odometry", t - 1e-4,
                    rb2.encode_odometry_msg(Odometry(
                        stamp=t, orientation=(0.0, 0.0, 0.0, 1.0),
                        linear_velocity=(V_TRUE[0], V_TRUE[1], 0.0))))
            w.write("/height", "mrs_msgs/msg/Float64Stamped", t - 1e-4,
                    rb2.encode_float64_stamped_msg(
                        Float64Stamped(stamp=t, value=HEIGHT)))
            pos = (V_TRUE[0] * i * DT, V_TRUE[1] * i * DT)
            frame = np.clip(np.round(scene.render(pos)), 0, 255).astype(np.uint8)
            w.write("/image", "sensor_msgs/msg/Image", t,
                    rb2.encode_image_msg(ImageMsg(stamp=t, data=frame)))

    frames, twists = _replay(path)
    assert frames == 6
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(v - np.array(V_TRUE)).max() < 0.15, v
