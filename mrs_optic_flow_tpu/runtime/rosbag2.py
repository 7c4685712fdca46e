"""Offline ROS2 rosbag2 replay — no ROS installation required.

The reference targets ROS1 (``package.xml``, noetic/melodic CI), but the
flights its users record today increasingly live in **rosbag2** archives:
a directory of sqlite3 ``*.db3`` storage files plus ``metadata.yaml``,
with each message serialized as DDS **CDR** instead of ROS1's flat
little-endian format.  This module is the rosbag2 counterpart of
:mod:`.rosbag` and closes that half of the replay surface with stdlib
only (``sqlite3`` ships with CPython):

- :class:`Bag2Reader` reads the sqlite storage schema (``topics`` +
  ``messages`` tables, storage versions 2-6) from a single ``.db3`` file
  or a bag directory (split ``.db3`` files are replayed in
  ``metadata.yaml`` order when that file is parseable, filename order
  otherwise).
- :class:`_Cdr` is a plain-CDR (XCDR1) cursor — encapsulation header,
  both endiannesses, size-aligned primitives, u32-length-with-NUL
  strings — covering exactly the message set the node consumes.  ROS2
  message layouts differ from ROS1 (no ``Header.seq``, ``Time.sec`` is
  int32, CameraInfo's fields are lowercase ``d``/``k``/...), so each
  type gets its own decoder here; the duck-typed objects then reuse the
  conformance-tested converters in :mod:`.ros_bridge`.
- :func:`replay_bag2` drives the SAME replay loop as the ROS1 path
  (:func:`.rosbag._replay_from` — role auto-resolution, level-flight
  defaults, ``/tf``/``/tf_static`` camera→body resolution) with the ROS2
  role table.

The CLI accepts it directly: ``python -m mrs_optic_flow_tpu --replay
flight_dir/`` (or ``--replay flight.db3``); ``--bag-info`` understands
both formats.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from types import SimpleNamespace
from typing import Any, Dict, Iterator, List, Optional, Tuple

from mrs_optic_flow_tpu.runtime import ros_bridge as _rb
from mrs_optic_flow_tpu.runtime.msgs import Float64Stamped
from mrs_optic_flow_tpu.runtime.rosbag import (
    BagFormatError,
    _replay_from,
)


class Bag2FormatError(BagFormatError):
    """The file/directory is not a parseable rosbag2 (sqlite3) bag."""


def is_rosbag2(path: str) -> bool:
    """Cheap dispatch test used by the CLI: a ``.db3`` file, or a directory
    holding ``metadata.yaml`` / ``*.db3`` storage files."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "metadata.yaml")):
            return True
        try:
            return any(n.endswith(".db3") for n in os.listdir(path))
        except OSError:
            return False
    return path.endswith(".db3")


# ------------------------------------------------------------------ #
# sqlite3 storage                                                      #
# ------------------------------------------------------------------ #


def _storage_files(path: str) -> List[str]:
    """The bag's ``.db3`` files in replay order."""
    if not os.path.isdir(path):
        return [path]
    names = sorted(n for n in os.listdir(path) if n.endswith(".db3"))
    meta = os.path.join(path, "metadata.yaml")
    if os.path.exists(meta):
        # honor metadata.yaml's relative_file_paths order when possible
        # (split bags are chronological in that order); fall back to the
        # name sort on any parse trouble — never fail the replay over it
        try:
            import yaml  # noqa: PLC0415

            with open(meta) as fh:
                info = yaml.safe_load(fh) or {}
            rel = info.get("rosbag2_bagfile_information", {}).get(
                "relative_file_paths", []
            )
            ordered = [
                os.path.join(path, r) for r in rel
                if os.path.exists(os.path.join(path, r))
            ]
            if ordered:
                extra = [os.path.join(path, n) for n in names
                         if os.path.join(path, n) not in ordered]
                return ordered + extra
        except Exception:  # noqa: BLE001 — metadata is advisory only
            pass
    if not names:
        raise Bag2FormatError(f"{path}: no .db3 storage files in directory")
    return [os.path.join(path, n) for n in names]


class Bag2Reader:
    """Stream ``(time_s, topic, type_name, raw_cdr_bytes)`` from a rosbag2
    sqlite3 bag (a ``.db3`` file or a bag directory)."""

    def __init__(self, path: str):
        self.path = path
        self.files = _storage_files(path)
        #: topic name -> ROS2 type name (e.g. ``sensor_msgs/msg/Image``)
        self.topic_types: Dict[str, str] = {}
        for f in self.files:
            for name, type_name, fmt in self._topics_of(f):
                if fmt not in ("cdr", "", None):
                    raise Bag2FormatError(
                        f"{f}: topic {name!r} uses serialization "
                        f"{fmt!r}; only 'cdr' is supported"
                    )
                self.topic_types[name] = type_name

    @staticmethod
    def _connect(fname: str) -> sqlite3.Connection:
        if not os.path.exists(fname):
            raise Bag2FormatError(f"{fname}: no such file")
        # uri=True + mode=ro: never create/modify a database at this path
        try:
            con = sqlite3.connect(
                f"file:{fname}?mode=ro&immutable=1", uri=True
            )
        except sqlite3.OperationalError:
            # sqlite URI parsing chokes on some path characters (space, %,
            # #); plain connect still only ever SELECTs here
            con = sqlite3.connect(fname)
        con.text_factory = lambda b: b.decode("utf-8", "replace")
        return con

    @classmethod
    def _topics_of(cls, fname: str) -> List[Tuple[str, str, Optional[str]]]:
        con = cls._connect(fname)
        try:
            try:
                rows = con.execute(
                    "SELECT name, type, serialization_format FROM topics"
                ).fetchall()
                return [(n, t, f) for n, t, f in rows]
            except sqlite3.OperationalError:
                # storage v1 lacks serialization_format
                rows = con.execute("SELECT name, type FROM topics").fetchall()
                return [(n, t, None) for n, t in rows]
        except sqlite3.DatabaseError as e:
            raise Bag2FormatError(
                f"{fname}: not a rosbag2 sqlite3 storage file ({e})"
            ) from e
        finally:
            con.close()

    def messages(self) -> Iterator[Tuple[float, str, str, bytes]]:
        for fname in self.files:
            con = self._connect(fname)
            try:
                try:
                    topic_of = dict(
                        con.execute("SELECT id, name FROM topics").fetchall()
                    )
                    # fetchall up front: a DatabaseError surfacing mid-
                    # iteration (truncated storage) must still wrap as
                    # Bag2FormatError, and flight bags stream fine row-wise
                    # only when intact anyway
                    cur = con.execute(
                        "SELECT timestamp, topic_id, data FROM messages "
                        "ORDER BY timestamp, id"
                    )
                    rows = iter(cur.fetchmany(256))
                except sqlite3.DatabaseError as e:
                    raise Bag2FormatError(
                        f"{fname}: not a rosbag2 sqlite3 storage file ({e})"
                    ) from e
                while True:
                    for ts, topic_id, data in rows:
                        topic = topic_of.get(topic_id)
                        if topic is None:
                            raise Bag2FormatError(
                                f"{fname}: message references unknown "
                                f"topic id {topic_id}"
                            )
                        yield (
                            ts * 1e-9, topic,
                            self.topic_types.get(topic, ""), bytes(data),
                        )
                    try:
                        batch = cur.fetchmany(256)
                    except sqlite3.DatabaseError as e:
                        raise Bag2FormatError(
                            f"{fname}: corrupt rosbag2 storage ({e})"
                        ) from e
                    if not batch:
                        break
                    rows = iter(batch)
            finally:
                con.close()

    def topics_by_type(self) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for topic, type_name in self.topic_types.items():
            out.setdefault(type_name, [])
            if topic not in out[type_name]:
                out[type_name].append(topic)
        return out

    def close(self) -> None:  # connections are per-iteration; nothing held
        pass

    def __enter__(self) -> "Bag2Reader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ------------------------------------------------------------------ #
# CDR (XCDR1) deserialization                                          #
# ------------------------------------------------------------------ #


class _Cdr:
    """Plain-CDR cursor: 4-byte encapsulation header (``00 01`` = LE,
    ``00 00`` = BE), then size-aligned primitives relative to byte 4.
    XCDR2/PL_CDR representations (mutable/appendable types — not used by
    the stock ROS2 message set) are rejected up front."""

    __slots__ = ("buf", "off", "e")

    def __init__(self, buf: bytes):
        if len(buf) < 4 or buf[0] != 0x00 or buf[1] > 0x01:
            rep = buf[:2].hex() if len(buf) >= 2 else buf.hex()
            raise Bag2FormatError(
                f"unsupported CDR encapsulation {rep!r} (plain CDR "
                "expected; PL_CDR/XCDR2 payloads are not ROS2 stock types)"
            )
        self.buf = buf
        self.off = 4
        self.e = "<" if buf[1] == 0x01 else ">"

    def _align(self, n: int) -> None:
        self.off += (-(self.off - 4)) % n

    def _unpack(self, fmt: str, size: int):
        self._align(size)
        try:
            (v,) = struct.unpack_from(self.e + fmt, self.buf, self.off)
        except struct.error as e:
            raise Bag2FormatError(f"truncated CDR payload ({e})") from e
        self.off += size
        return v

    def u8(self) -> int:
        return self._unpack("B", 1)

    def u32(self) -> int:
        return self._unpack("I", 4)

    def i32(self) -> int:
        return self._unpack("i", 4)

    def f64(self) -> float:
        return self._unpack("d", 8)

    def f64s(self, n: int) -> Tuple[float, ...]:
        self._align(8)
        try:
            v = struct.unpack_from(f"{self.e}{n}d", self.buf, self.off)
        except struct.error as e:
            raise Bag2FormatError(f"truncated CDR payload ({e})") from e
        self.off += 8 * n
        return v

    def seq_f64(self) -> Tuple[float, ...]:
        return self.f64s(self.u32())

    def string(self) -> str:
        n = self.u32()  # length INCLUDING the NUL terminator
        v = self.buf[self.off : self.off + n]
        if len(v) != n:
            raise Bag2FormatError("truncated CDR string")
        self.off += n
        return v[:-1].decode("utf-8", "replace") if n else ""

    def raw(self, n: int) -> bytes:
        v = self.buf[self.off : self.off + n]
        if len(v) != n:
            raise Bag2FormatError("truncated CDR byte sequence")
        self.off += n
        return v

    def bytes_seq(self) -> bytes:
        return self.raw(self.u32())

    def time(self) -> float:
        """builtin_interfaces/Time: int32 sec + uint32 nanosec."""
        return self.i32() + self.u32() * 1e-9

    def header(self) -> float:
        """std_msgs/Header (ROS2: stamp + frame_id, NO seq) -> stamp [s]."""
        stamp = self.time()
        self.string()  # frame_id
        return stamp

    def xyz(self) -> SimpleNamespace:
        return SimpleNamespace(x=self.f64(), y=self.f64(), z=self.f64())

    def quat(self) -> SimpleNamespace:
        return SimpleNamespace(
            x=self.f64(), y=self.f64(), z=self.f64(), w=self.f64()
        )


def _hdr_ns(stamp: float) -> SimpleNamespace:
    return SimpleNamespace(stamp=stamp)


def decode_image_msg(buf: bytes):
    """sensor_msgs/msg/Image -> :class:`ImageMsg` (via the bridge's stride-
    and encoding-aware ``decode_image``)."""
    c = _Cdr(buf)
    stamp = c.header()
    height, width = c.u32(), c.u32()
    encoding = c.string()
    c.u8()  # is_bigendian — pixel data is bytes; CDR's endianness is c.e
    step = c.u32()
    data = c.bytes_seq()
    return _rb.decode_image(
        SimpleNamespace(
            header=_hdr_ns(stamp), height=height, width=width,
            encoding=encoding, step=step, data=data,
        )
    )


def decode_compressed_image_msg(buf: bytes):
    """sensor_msgs/msg/CompressedImage -> :class:`ImageMsg` (cv2 decode,
    like the ROS1 path)."""
    c = _Cdr(buf)
    stamp = c.header()
    fmt = c.string()
    data = c.bytes_seq()
    try:
        import cv2  # noqa: PLC0415 — optional
        import numpy as np  # noqa: PLC0415
    except ImportError as e:
        raise Bag2FormatError(
            f"CompressedImage ({fmt!r}) in the bag needs cv2 to decode"
        ) from e
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise Bag2FormatError(f"cv2 could not decode CompressedImage ({fmt!r})")
    from mrs_optic_flow_tpu.runtime.msgs import ImageMsg  # noqa: PLC0415

    return ImageMsg(stamp=stamp, data=img[..., :3] if img.ndim == 3 else img)


def decode_camera_info_msg(buf: bytes):
    """sensor_msgs/msg/CameraInfo -> :class:`CameraInfo` (ROS2 field names
    are lowercase ``d``/``k``/``r``/``p``; same wire order as ROS1)."""
    c = _Cdr(buf)
    stamp = c.header()
    c.u32(), c.u32()  # height, width
    c.string()  # distortion_model
    d = list(c.seq_f64())
    k = list(c.f64s(9))
    c.f64s(9)  # r
    c.f64s(12)  # p
    binning_x = c.u32()
    return _rb.from_camera_info(
        SimpleNamespace(header=_hdr_ns(stamp), K=k, D=d, binning_x=binning_x)
    )


def decode_imu_msg(buf: bytes):
    """sensor_msgs/msg/Imu -> :class:`Imu`."""
    c = _Cdr(buf)
    stamp = c.header()
    orientation = c.quat()
    c.f64s(9)  # orientation_covariance
    angular_velocity = c.xyz()
    # remaining covariances + linear acceleration: not consumed by the node
    return _rb.from_imu(
        SimpleNamespace(
            header=_hdr_ns(stamp),
            orientation=orientation,
            angular_velocity=angular_velocity,
        )
    )


def decode_odometry_msg(buf: bytes):
    """nav_msgs/msg/Odometry -> :class:`Odometry`."""
    c = _Cdr(buf)
    stamp = c.header()
    c.string()  # child_frame_id
    c.xyz()  # pose.pose.position
    orientation = c.quat()
    c.f64s(36)  # pose.covariance
    linear = c.xyz()
    angular = c.xyz()
    return _rb.from_odometry(
        SimpleNamespace(
            header=_hdr_ns(stamp),
            pose=SimpleNamespace(pose=SimpleNamespace(orientation=orientation)),
            twist=SimpleNamespace(
                twist=SimpleNamespace(linear=linear, angular=angular)
            ),
        )
    )


def decode_float64_stamped_msg(buf: bytes) -> Float64Stamped:
    """mrs_msgs/msg/Float64Stamped (the height topic's ROS2 port)."""
    c = _Cdr(buf)
    stamp = c.header()
    return Float64Stamped(stamp=stamp, value=c.f64())


def decode_tf_message(buf: bytes) -> List[Tuple[str, str, Tuple[float, ...]]]:
    """tf2_msgs/msg/TFMessage -> ``[(parent, child, quat xyzw), ...]``
    (rotation only, like the ROS1 decoder — the node consumes no
    translations)."""
    c = _Cdr(buf)
    out = []
    for _ in range(c.u32()):
        # geometry_msgs/msg/TransformStamped: the Header's frame_id is the
        # PARENT frame, so it is read field by field
        c.time()  # header.stamp
        parent = c.string()
        child = c.string()
        c.f64s(3)  # transform.translation
        out.append((parent, child, c.f64s(4)))
    return out


#: role -> (ROS2 type names, node callback name, decoder) — the ROS2 twin
#: of ``rosbag._ROLES``; ``std_msgs/msg/Float64Stamped`` is accepted for
#: height alongside the mrs_msgs name (same wire layout, used by stacks
#: that vendor the type).
_ROLES2: Dict[str, Tuple[Tuple[str, ...], str, Any]] = {
    "image": (("sensor_msgs/msg/Image",), "on_image", decode_image_msg),
    "compressed_image": (
        ("sensor_msgs/msg/CompressedImage",), "on_image",
        decode_compressed_image_msg,
    ),
    "camera_info": (
        ("sensor_msgs/msg/CameraInfo",), "on_camera_info",
        decode_camera_info_msg,
    ),
    "imu": (("sensor_msgs/msg/Imu",), "on_imu", decode_imu_msg),
    "odometry": (("nav_msgs/msg/Odometry",), "on_odometry",
                 decode_odometry_msg),
    "height": (
        ("mrs_msgs/msg/Float64Stamped", "std_msgs/msg/Float64Stamped"),
        "on_height", decode_float64_stamped_msg,
    ),
}

_TF_TYPES2 = ("tf2_msgs/msg/TFMessage",)


def replay_bag2(
    node,
    path: str,
    topics: Optional[Dict[str, str]] = None,
    *,
    default_height: float = 2.0,
    limit: Optional[int] = None,
    camera_frame: Optional[str] = None,
    uav_frame: Optional[str] = None,
) -> int:
    """Drive ``node`` with a recorded ROS2 flight — rosbag2's counterpart
    of :func:`.rosbag.replay_bag`, same semantics (role auto-resolution and
    pinning, level-flight defaults for missing roles, camera→body from the
    bag's ``/tf``/``/tf_static`` when the frame ids are given).  Returns
    the number of image frames dispatched."""
    with Bag2Reader(path) as reader:
        return _replay_from(
            reader, node, topics, default_height, limit,
            camera_frame, uav_frame,
            roles=_ROLES2, tf_types=_TF_TYPES2, tf_decode=decode_tf_message,
        )
