"""Closed-loop synthetic flight harness.

The reference's ultimate validation is real UAV flights consuming the full
policy surface — the four ``long_range_mode`` policies and the
landoff-tracker handoff (``src/optic_flow.cpp:1575-1585``, tracker gate
``:1355-1366``) switching mid-stream as height changes.  This module is the
synthetic stand-in: a full trajectory (takeoff -> cruise -> yawing descent)
over a textured ground plane, rendered with exact projective geometry
(:class:`SyntheticScene.render_pose`) and accompanied by CONSISTENT
IMU / odometry / height / tracker streams, driven end-to-end through
:class:`OpticFlowNode` with trajectory-level metrics out.

The harness is a product surface, not just a test fixture: deployments can
re-run it after config changes as a regression gate (``FlightReport``
carries velocity RMSE, covariance consistency, and per-phase publish
coverage), and the rendered stream can be exported as an ``.ofrec``
recording (:meth:`FlightSimulator.record_ofrec`) so the offline-replay
path is exercised by the same artifact.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mrs_optic_flow_tpu.runtime.msgs import (
    Float64Stamped,
    ImageMsg,
    Imu,
    Odometry,
    TrackerStatus,
)
from mrs_optic_flow_tpu.runtime.stream import FrameStream, SyntheticScene
from mrs_optic_flow_tpu.utils.quat_np import np_quat_from_rpy


@dataclasses.dataclass
class FlightSample:
    """Ground truth at one frame instant."""

    t: float
    pos: np.ndarray  # [3] world position (x, y, height) [m]
    vel: np.ndarray  # [3] world velocity over the PRECEDING interval [m/s]
    yaw: float  # [rad]
    yaw_rate: float  # [rad/s] over the preceding interval
    tracker: str  # active MRS tracker name
    phase: str  # "takeoff" | "cruise" | "descent"

    @property
    def vel_body(self) -> np.ndarray:
        """World velocity expressed in the yaw-rotated body frame — the
        frame the node's published twist lives in (c2b = identity, detilt
        removes only roll/pitch: ``src/optic_flow.cpp:1694-1702``)."""
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        r_wb = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        return r_wb.T @ self.vel


def takeoff_cruise_descent_profile(
    *,
    dt: float = 0.05,
    t0: float = 100.0,
    takeoff_frames: int = 36,
    cruise_frames: int = 16,
    descent_frames: int = 36,
    h0: float = 0.8,
    h_cruise: float = 2.0,
    h_final: float = 1.0,
    v_takeoff_xy: Tuple[float, float] = (0.3, 0.0),
    v_cruise_xy: Tuple[float, float] = (0.6, 0.2),
    descent_yaw_rate: float = 0.35,
) -> List[FlightSample]:
    """The canonical three-phase flight:

    - **takeoff**: LandoffTracker active, climbing ``h0`` -> ``h_cruise``
      with a small horizontal drift — the regime where the reference's
      takeoff/height policies select the 4x-downsampled long-range path;
    - **cruise**: constant height, constant horizontal velocity;
    - **yawing descent**: hovering in xy while descending to ``h_final``
      under a constant yaw rate — rotation + zoom flow that exercises the
      full homography decomposition (and the scale/rotation estimator).

    Heights follow COSINE-EASED ramps (slow near the endpoints): the
    frame-to-frame image zoom is ``vz * dt / h``, so a constant-rate climb
    at low altitude produces scale changes no frame-to-frame correlator —
    the reference's included (``cv::phaseCorrelate``) — survives; a real
    UAV's 20-60 fps streams never see more than a few percent per frame,
    and easing keeps this profile inside that envelope exactly where ``h``
    is smallest.
    """

    def eased(a: float, b: float, k: int, i: int) -> float:
        # cosine ease from a to b over k intervals, evaluated at frame i
        return a + (b - a) * 0.5 * (1.0 - np.cos(np.pi * min(i, k) / k))

    pos_list: List[np.ndarray] = []
    meta: List[Tuple[str, str, float]] = []  # (phase, tracker, yaw)
    xy = np.zeros(2)
    yaw = 0.0
    for i in range(takeoff_frames + 1):
        pos_list.append(np.array([*xy, eased(h0, h_cruise, takeoff_frames, i)]))
        meta.append(("takeoff", "LandoffTracker", yaw))
        xy = xy + np.asarray(v_takeoff_xy) * dt
    for _ in range(cruise_frames):
        pos_list.append(np.array([*xy, h_cruise]))
        meta.append(("cruise", "MpcTracker", yaw))
        xy = xy + np.asarray(v_cruise_xy) * dt
    for i in range(descent_frames):
        yaw += descent_yaw_rate * dt
        pos_list.append(
            np.array([*xy, eased(h_cruise, h_final, descent_frames, i + 1)])
        )
        meta.append(("descent", "MpcTracker", yaw))

    samples: List[FlightSample] = []
    for i, (pos, (phase, tracker, yw)) in enumerate(zip(pos_list, meta)):
        vel = (pos - pos_list[i - 1]) / dt if i else np.zeros(3)
        yr = (yw - meta[i - 1][2]) / dt if i else 0.0
        samples.append(FlightSample(
            t=t0 + i * dt, pos=pos, vel=vel, yaw=yw, yaw_rate=yr,
            tracker=tracker, phase=phase,
        ))
    return samples


class FlightSimulator:
    """Render a :func:`takeoff_cruise_descent_profile`-style trajectory and
    feed it — frames plus consistent sensor streams — into an
    :class:`OpticFlowNode` (via :class:`FrameStream`) or an ``.ofrec``
    recording."""

    def __init__(
        self,
        samples: Sequence[FlightSample],
        *,
        scene: Optional[SyntheticScene] = None,
        seed: int = 7,
        texture_cutoff: float = 0.3,
    ):
        self.samples = list(samples)
        self.scene = scene or SyntheticScene(
            seed=seed, texture_cutoff=texture_cutoff
        )

    def render(self, s: FlightSample) -> np.ndarray:
        return self.scene.render_pose(
            (float(s.pos[0]), float(s.pos[1])), (0.0, 0.0, s.yaw),
            height=float(s.pos[2]),
        )

    def frames(self) -> List[np.ndarray]:
        return [self.render(s) for s in self.samples]

    def events_into(
        self, stream: FrameStream, frames: Optional[Sequence[np.ndarray]] = None
    ) -> FrameStream:
        """Queue the whole flight: camera info, then per frame the tracker
        status, IMU (yaw attitude + yaw rate), odometry (orientation +
        world-frame speed), height, and the rendered image — each sensor
        stamped just before its frame, the arrival order a live graph
        produces."""
        if frames is None:
            frames = self.frames()
        stream.add("camera_info", self.samples[0].t - 1.0,
                   self.scene.camera_info())
        for s, img in zip(self.samples, frames):
            q = tuple(np_quat_from_rpy(0.0, 0.0, s.yaw))
            stream.add("tracker", s.t - 2e-4, TrackerStatus(
                active_tracker=s.tracker))
            stream.add("imu", s.t - 1e-4, Imu(
                stamp=s.t, angular_velocity=(0.0, 0.0, s.yaw_rate),
                orientation=q))
            stream.add("odometry", s.t - 1e-4, Odometry(
                stamp=s.t, orientation=q,
                linear_velocity=tuple(s.vel),
                angular_velocity=(0.0, 0.0, s.yaw_rate)))
            stream.add("height", s.t - 1e-4, Float64Stamped(
                stamp=s.t, value=float(s.pos[2])))
            stream.add("image", s.t, ImageMsg(stamp=s.t, data=img))
        return stream

    def record_ofrec(self, path: str, frames: Optional[Sequence[np.ndarray]] = None):
        """Write the rendered flight as a timestamped ``.ofrec`` raw-frame
        recording (the native Recorder format) — the offline-replay artifact
        (``runtime.viz`` / ``native.Replay``)."""
        from mrs_optic_flow_tpu import native

        if frames is None:
            frames = self.frames()
        with native.Recorder(
            path, width=self.scene.width, height=self.scene.height_px
        ) as rec:
            for s, img in zip(self.samples, frames):
                rec.write(s.t, np.clip(np.rint(img), 0, 255).astype(np.uint8))

    def record_bag(self, path: str, frames: Optional[Sequence[np.ndarray]] = None):
        """Write the flight as a ROS1 bag (``runtime.rosbag.BagWriter``) —
        camera info, IMU, odometry, height, and the rendered frames on the
        reference's topic types — so ``replay_bag`` drives the node from
        the SAME artifact a real flight recording would."""
        from mrs_optic_flow_tpu.runtime import rosbag as rb

        if frames is None:
            frames = self.frames()
        info = self.scene.camera_info()
        with rb.BagWriter(path) as bag:
            bag.write(
                "/camera_info", "sensor_msgs/CameraInfo",
                self.samples[0].t - 1.0,
                rb.encode_camera_info_msg(
                    info, self.samples[0].t - 1.0,
                    shape=(self.scene.height_px, self.scene.width),
                ),
            )
            for s, img in zip(self.samples, frames):
                q = tuple(np_quat_from_rpy(0.0, 0.0, s.yaw))
                bag.write("/imu", "sensor_msgs/Imu", s.t - 1e-4,
                          rb.encode_imu_msg(Imu(
                              stamp=s.t,
                              angular_velocity=(0.0, 0.0, s.yaw_rate),
                              orientation=q)))
                bag.write("/odometry", "nav_msgs/Odometry", s.t - 1e-4,
                          rb.encode_odometry_msg(Odometry(
                              stamp=s.t, orientation=q,
                              linear_velocity=tuple(s.vel),
                              angular_velocity=(0.0, 0.0, s.yaw_rate))))
                bag.write("/height", "mrs_msgs/Float64Stamped", s.t - 1e-4,
                          rb.encode_float64_stamped_msg(Float64Stamped(
                              stamp=s.t, value=float(s.pos[2]))))
                bag.write("/image_raw", "sensor_msgs/Image", s.t,
                          rb.encode_image_msg(ImageMsg(stamp=s.t, data=img)))

    def record_bag2(self, path: str, frames: Optional[Sequence[np.ndarray]] = None):
        """Write the flight as a ROS2 rosbag2 directory
        (``runtime.rosbag2.Bag2Writer``: sqlite3 storage + metadata.yaml,
        CDR serialization) — the ROS2 twin of :meth:`record_bag`, replayed
        by ``replay_bag2`` / stock ``ros2 bag play``."""
        from mrs_optic_flow_tpu.runtime import rosbag2 as rb2

        if frames is None:
            frames = self.frames()
        info = self.scene.camera_info()
        with rb2.Bag2Writer(path) as bag:
            bag.write(
                "/camera_info", "sensor_msgs/msg/CameraInfo",
                self.samples[0].t - 1.0,
                rb2.encode_camera_info_msg(
                    info, self.samples[0].t - 1.0,
                    shape=(self.scene.height_px, self.scene.width),
                ),
            )
            for s, img in zip(self.samples, frames):
                q = tuple(np_quat_from_rpy(0.0, 0.0, s.yaw))
                bag.write("/imu", "sensor_msgs/msg/Imu", s.t - 1e-4,
                          rb2.encode_imu_msg(Imu(
                              stamp=s.t,
                              angular_velocity=(0.0, 0.0, s.yaw_rate),
                              orientation=q)))
                bag.write("/odometry", "nav_msgs/msg/Odometry", s.t - 1e-4,
                          rb2.encode_odometry_msg(Odometry(
                              stamp=s.t, orientation=q,
                              linear_velocity=tuple(s.vel),
                              angular_velocity=(0.0, 0.0, s.yaw_rate))))
                bag.write("/height", "mrs_msgs/msg/Float64Stamped", s.t - 1e-4,
                          rb2.encode_float64_stamped_msg(Float64Stamped(
                              stamp=s.t, value=float(s.pos[2]))))
                bag.write("/image_raw", "sensor_msgs/msg/Image", s.t,
                          rb2.encode_image_msg(ImageMsg(stamp=s.t, data=img)))


@dataclasses.dataclass
class FlightReport:
    """Trajectory-level conformance metrics of one closed-loop flight."""

    n_frames: int
    n_published: int  # frames that produced a velocity estimate
    rmse_xy: float  # [m/s] vs ground-truth body-frame velocity
    max_err_xy: float  # [m/s]
    within_3sigma: float  # fraction of estimates within 3*sqrt(cov_xy)
    nan_published: int  # published twists carrying NaN xy (must be 0)
    mode_switches: List[int]  # frame indices where SR<->LR mode flipped
    dropped_at_switches: int  # invalid frames adjacent to a mode switch
    per_phase_coverage: dict  # phase -> published / frames


def evaluate_flight(
    samples: Sequence[FlightSample],
    published: Sequence[Tuple[str, object]],
    *,
    warmup_frames: int = 2,
) -> FlightReport:
    """Score a flight: match each published twist (``velocity_out`` or
    ``velocity_out_longrange``) to its ground-truth sample by stamp and
    compute trajectory metrics.  ``published`` is the node's collected
    ``(topic, msg)`` stream."""
    by_stamp = {}
    for topic, msg in published:
        if topic in ("velocity_out", "velocity_out_longrange"):
            by_stamp[round(float(msg.stamp), 6)] = (topic, msg)

    errs, sigmas, phases_pub = [], [], {}
    n_pub = nan_pub = 0
    topics_seq = []
    phase_counts = {}
    for i, s in enumerate(samples):
        if i < warmup_frames:
            continue
        phase_counts[s.phase] = phase_counts.get(s.phase, 0) + 1
        hit = by_stamp.get(round(s.t, 6))
        topics_seq.append(hit[0] if hit else None)
        if hit is None:
            continue
        topic, tw = hit
        n_pub += 1
        phases_pub[s.phase] = phases_pub.get(s.phase, 0) + 1
        v = np.asarray(tw.linear[:2], float)
        if not np.all(np.isfinite(v)):
            nan_pub += 1
            continue
        err = float(np.linalg.norm(v - s.vel_body[:2]))
        errs.append(err)
        sigmas.append(float(np.sqrt(max(np.asarray(tw.covariance)[0], 1e-12))))

    # mode switches: consecutive published frames on different topic families
    seen = [t for t in topics_seq if t is not None]
    switches = [
        i for i in range(1, len(seen)) if seen[i] != seen[i - 1]
    ]
    # frames dropped adjacent to a topic-family flip (index into topics_seq)
    flips = [
        i for i in range(1, len(topics_seq))
        if topics_seq[i] is not None
        and any(t is not None and t != topics_seq[i]
                for t in topics_seq[max(0, i - 2):i])
    ]
    dropped = sum(
        1 for i in flips
        for j in (i - 1, i + 1)
        if 0 <= j < len(topics_seq) and topics_seq[j] is None
    )

    errs_a = np.asarray(errs) if errs else np.asarray([np.inf])
    sig_a = np.asarray(sigmas) if sigmas else np.asarray([1.0])
    return FlightReport(
        n_frames=len(samples) - warmup_frames,
        n_published=n_pub,
        rmse_xy=float(np.sqrt(np.mean(errs_a**2))),
        max_err_xy=float(errs_a.max()),
        within_3sigma=float(np.mean(errs_a <= 3.0 * sig_a)),
        nan_published=nan_pub,
        mode_switches=switches,
        dropped_at_switches=dropped,
        per_phase_coverage={
            k: phases_pub.get(k, 0) / v for k, v in phase_counts.items()
        },
    )
