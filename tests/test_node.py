"""End-to-end node tests: synthetic scene -> twist out, ground truth known.

This is the harness the reference never had (SURVEY.md section 4): a
rosbag-replay-style stream with a constant-velocity camera over a textured
floor, asserting the published TwistWithCovarianceStamped against the true
velocity.
"""

import numpy as np
import pytest

from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime import FrameStream, OpticFlowNode, SyntheticScene
from mrs_optic_flow_tpu.runtime.msgs import (
    Float64Stamped,
    ImageMsg,
    Imu,
    Odometry,
    TrackerStatus,
)
from mrs_optic_flow_tpu.runtime.viz import flow_overlay, load_pgm, save_pgm


def _make_node(collected, **overrides):
    cfg = load_config(overrides=overrides or None)
    node = OpticFlowNode(cfg, publish=lambda t, m: collected.append((t, m)), log=lambda s: None)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))  # camera == body
    return node


V_TRUE = (0.8, -0.5)
DT = 0.05
HEIGHT = 2.0


def test_e2e_velocity_recovery():
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=1)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=V_TRUE, n_frames=6, dt=DT)
    outputs = stream.run()

    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3, "expected velocity publishes after warmup"
    v = np.array([tw.linear[:2] for tw in twists[1:]])  # skip first (prev=seed)
    err = np.abs(v - np.array(V_TRUE)).max(0)
    assert np.all(err < 0.15), (v.mean(0), V_TRUE)
    # covariance heuristic (src/optic_flow.cpp:1757): (50 h / fx)^2
    cov0 = twists[0].covariance[0]
    assert abs(cov0 - (50.0 * HEIGHT / 420.0) ** 2) < 1e-9
    assert twists[0].frame_id == "fcu_untilted"


def test_gating_before_ready():
    published = []
    node = _make_node(published)
    # image before odometry/imu/tf -> ignored
    node.got_tfs = False
    out = node.on_image(ImageMsg(stamp=1.0, data=np.zeros((480, 752), np.float32)))
    assert out is None and not published


def test_rate_cap():
    published = []
    node = _make_node(published, mrs_optic_flow={"max_processing_rate": 10})
    scene = SyntheticScene(uav_height=HEIGHT, seed=2)
    stream = FrameStream(node)
    # 100 Hz frames against a 10 Hz cap -> nearly all skipped
    scene.trajectory_events(stream, velocity=(0.0, 0.0), n_frames=8, dt=0.01)
    stream.run()
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) == 0


def test_dt_rejection():
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=3)
    node.on_camera_info(scene.camera_info())
    node.on_imu(Imu(stamp=0.0, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
    node.on_odometry(Odometry(stamp=0.0, orientation=(0, 0, 0, 1)))
    node.on_height(Float64Stamped(stamp=0.0, value=HEIGHT))
    img = scene.render((0.0, 0.0))
    assert node.on_image(ImageMsg(stamp=1.0, data=img)) is None  # first frame
    assert node.on_image(ImageMsg(stamp=1.05, data=img)) is not None or True
    # negative dt -> rejected (src/optic_flow.cpp:1425-1428)
    before = node._frames_processed
    assert node.on_image(ImageMsg(stamp=0.9, data=img)) is None
    assert node._frames_processed == before


def test_long_range_mode_height_based():
    published = []
    node = _make_node(
        published,
        mrs_optic_flow={"long_range_mode": "height_based", "takeoff_height": 5.0},
    )
    scene = SyntheticScene(uav_height=HEIGHT, seed=4)  # below 5 m -> long range
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.6, 0.0), n_frames=5, dt=DT)
    stream.run()
    lr = [m for t, m in published if t == "velocity_out_longrange"]
    diff = [m for t, m in published if t == "velocity_out_longrange_diff"]
    assert len(lr) >= 2 and len(diff) == len(lr)
    v = np.array([tw.linear[:2] for tw in lr[1:]])
    assert np.abs(v[:, 0] - 0.6).max() < 0.25, v
    assert np.isnan(lr[0].linear[2]) and lr[0].covariance[14] == 666.0
    assert lr[0].frame_id == "fcu"


def test_long_range_ratio2_from_yaml():
    """``tpu.long_range_ratio: 2`` reaches the engine AND get2DT's ratio-2
    inlier-vote policy end-to-end (LONG_RANGE_RATIO src/FftMethod.cpp:3;
    policy src/optic_flow.cpp:414-421)."""
    published = []
    node = _make_node(
        published,
        mrs_optic_flow={"long_range_mode": "always_on"},
        tpu={"long_range_ratio": 2},
    )
    assert node.engine.config.long_range_ratio == 2
    # ratio 2 -> 240 px downsampled frame -> 2x2 grid of 120 px windows
    assert node.engine.sq_num_lr == 2
    scene = SyntheticScene(uav_height=HEIGHT, seed=7)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.6, 0.0), n_frames=5, dt=DT)
    stream.run()
    lr = [m for t, m in published if t == "velocity_out_longrange"]
    assert len(lr) >= 2
    v = np.array([tw.linear[:2] for tw in lr[1:]])
    assert np.abs(v[:, 0] - 0.6).max() < 0.25, v


def test_long_range_takeoff_based():
    published = []
    node = _make_node(published, mrs_optic_flow={"long_range_mode": "takeoff_based"})
    node.on_tracker_status(TrackerStatus(active_tracker="LandoffTracker"))
    assert node._resolve_long_range() is True
    node.on_tracker_status(TrackerStatus(active_tracker="MpcTracker"))
    assert node._resolve_long_range() is False


def test_flow_overlay_roundtrip(tmp_path, rng):
    frame = rng.integers(0, 255, size=(480, 480)).astype(np.float32)
    shifts = np.full((16, 2), 4.0, np.float32)
    shifts[3] = np.nan
    img = flow_overlay(frame, shifts, 120)
    p = tmp_path / "overlay.pgm"
    save_pgm(str(p), img)
    back = load_pgm(str(p))
    assert back.shape == (480, 480)
    np.testing.assert_array_equal(back, img)


def test_video_writer_avi_roundtrip(tmp_path, rng):
    """viz.VideoWriter emits a standard AVI (cv::VideoWriter parity,
    src/FftMethod.cpp:1695-1704) — conformance-read with OpenCV: bit-exact
    frames, fps and frame count from the header."""
    cv2 = pytest.importorskip("cv2")
    from mrs_optic_flow_tpu.runtime.viz import VideoWriter

    frames = [rng.integers(0, 255, size=(64, 64)).astype(np.uint8) for _ in range(4)]
    p = str(tmp_path / "flow.avi")
    with VideoWriter(p, 64, 64, fps=25.0) as w:
        for fr in frames:
            w.write(fr)
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(25.0)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    for i, fr in enumerate(frames):
        ok, img = cap.read()
        assert ok, f"frame {i} unreadable"
        np.testing.assert_array_equal(img, np.repeat(fr[..., None], 3, axis=-1))
    ok, _ = cap.read()
    assert not ok
    cap.release()


def test_video_writer_valid_without_close(tmp_path, rng):
    """The header is patched after every frame, so a crash (no close()) still
    leaves a readable file — same robustness need as the reference's
    always-open cv::VideoWriter."""
    cv2 = pytest.importorskip("cv2")
    from mrs_optic_flow_tpu.runtime.viz import VideoWriter

    frames = [rng.integers(0, 255, size=(64, 64)).astype(np.uint8) for _ in range(3)]
    p = str(tmp_path / "crash.avi")
    w = VideoWriter(p, 64, 64, fps=30.0)
    for fr in frames:
        w.write(fr)
    w._f.flush()  # simulate death without close(): no idx1, header patched
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    n = 0
    while True:
        ok, img = cap.read()
        if not ok:
            break
        np.testing.assert_array_equal(img[..., 0], frames[n])
        n += 1
    assert n == 3
    cap.release()
    w.close()


def test_node_store_video_avi(tmp_path):
    """store_video with a non-.ofrec path records the flow overlay as an AVI
    video (the reference records MPEG at src/FftMethod.cpp:1895-1897)."""
    cv2 = pytest.importorskip("cv2")
    p = str(tmp_path / "overlay.avi")
    published = []
    node = _make_node(published, store_video=True, video_path=p, video_fps=30)
    scene = SyntheticScene(uav_height=HEIGHT, seed=7)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.4, 0.2), n_frames=4, dt=DT)
    stream.run()
    node.close()
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n >= 3  # every processed frame after the seed
    ok, img = cap.read()
    assert ok and img.shape == (480, 480, 3)
    cap.release()


def test_node_gui_overlay(monkeypatch):
    """gui: true shows the live overlay via cv2.imshow (the reference's
    window at src/optic_flow.cpp:918-924, imshow src/FftMethod.cpp:1888)."""
    import sys
    import types

    calls = []
    fake = types.SimpleNamespace(
        imshow=lambda name, img: calls.append((name, img.shape)),
        waitKey=lambda ms: None,
    )
    monkeypatch.setitem(sys.modules, "cv2", fake)
    node = _make_node([], gui=True)
    scene = SyntheticScene(uav_height=HEIGHT, seed=9)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.3, 0.1), n_frames=3, dt=DT)
    stream.run()
    assert calls, "imshow never called with gui: true"
    assert calls[0][0] == "optic_flow" and calls[0][1] == (480, 480)


def test_node_gui_headless_disables(monkeypatch):
    """A failing imshow (headless host) disables the GUI after one attempt
    instead of raising per frame."""
    import sys
    import types

    def boom(*a):
        raise RuntimeError("no display")

    monkeypatch.setitem(sys.modules, "cv2",
                        types.SimpleNamespace(imshow=boom, waitKey=lambda ms: None))
    logs = []
    from mrs_optic_flow_tpu.config import load_config as _lc
    node = OpticFlowNode(_lc(overrides={"gui": True}),
                         publish=lambda t, m: None, log=logs.append)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    scene = SyntheticScene(uav_height=HEIGHT, seed=10)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.3, 0.1), n_frames=3, dt=DT)
    stream.run()  # no exception
    assert getattr(node, "_gui_failed", False) is True
    assert sum("gui disabled" in s for s in logs) == 1


@pytest.mark.slow
def test_profiler_collects():
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=5)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.3, 0.3), n_frames=4, dt=DT)
    stream.run()
    stats = node.profiler.stats()
    assert "frame_program" in stats and stats["frame_program"]["count"] >= 3
    report = node.profiler.report()
    assert "frame_program" in report


@pytest.mark.slow
def test_diagnostics_topics():
    """The reference advertises velocity_stddev_out / max_velocity_out /
    allsac_chosen_out without ever publishing (src/optic_flow.cpp:1036-1045);
    here they carry real data."""
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=12)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.5, 0.1), n_frames=6, dt=DT)
    stream.run()
    chosen = [m for t, m in published if t == "allsac_chosen_out"]
    maxv = [m for t, m in published if t == "max_velocity_out"]
    stddev = [m for t, m in published if t == "velocity_stddev_out"]
    assert chosen and all(c >= 8 for c in chosen)
    # max measurable speed: 80 px * h / (fx * dt)
    assert maxv and abs(maxv[0] - 80.0 * HEIGHT / (420.0 * DT)) < 1e-6
    assert stddev and all(len(s) == 3 for s in stddev)


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """save_state/load_state: a restored node continues without the
    first-frame glitch (no checkpointing exists in the reference —
    SURVEY.md section 5, 'resume = next frame')."""
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=13)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=V_TRUE, n_frames=4, dt=DT)
    stream.run()
    path = str(tmp_path / "state.npz")
    node.save_state(path)

    published2 = []
    node2 = _make_node(published2)
    node2.load_state(path)
    node2.got_odometry = node2.got_imu = True
    assert not bool(node2.flow_state.first)
    # continue the same trajectory: the very next frame yields a velocity
    t = 100.0 + 4 * DT
    node2.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
    node2.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
    node2.on_height(Float64Stamped(stamp=t, value=HEIGHT))
    node2._begin = t - DT
    pos = (V_TRUE[0] * 4 * DT, V_TRUE[1] * 4 * DT)
    tw = node2.on_image(ImageMsg(stamp=t, data=scene.render(pos)))
    assert tw is not None
    assert np.abs(np.array(tw.linear[:2]) - np.array(V_TRUE)).max() < 0.15


def test_health_tracking():
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=14)
    node.on_camera_info(scene.camera_info())
    assert node.health["ready"] is False  # no height/odometry yet
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.2, 0.0), n_frames=3, dt=DT)
    stream.run()
    h = node.health
    assert h["ready"] is True
    assert h["frames_processed"] >= 1
    assert h["consecutive_failures"] == 0


def test_camera_init_timeout():
    """timerCamInit analogue: images without camera info time out at 15 s
    (src/optic_flow.cpp:1116-1125)."""
    node = _make_node([])
    assert node.poll_camera_init(0.0) == "waiting_image"
    node.got_image = True
    assert node.poll_camera_init(5.0) == "waiting_info"
    assert node.poll_camera_init(20.0) == "timeout"
    scene = SyntheticScene(uav_height=HEIGHT, seed=15)
    node.on_camera_info(scene.camera_info())
    assert node.poll_camera_init(21.0) is None


def test_e2e_with_lens_distortion():
    """Distorted-camera scene: the undistort stage must still recover the
    true metric velocity (distortion typical of the reference's ~90 deg
    mvBlueFOX lens)."""
    published = []
    node = _make_node(published)
    scene = SyntheticScene(
        uav_height=HEIGHT, seed=21, dist_coeffs=(-0.25, 0.06, 1e-4, -2e-4, -0.004)
    )
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=V_TRUE, n_frames=6, dt=DT)
    stream.run()
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    err = np.abs(v - np.array(V_TRUE)).max(0)
    assert np.all(err < 0.15), (v.mean(0), V_TRUE)


def test_e2e_scale_factor():
    """``scale_factor: 2`` end-to-end: the node halves the image before
    crop/flow, and the geometry stage must decode with the DOWNSCALED
    intrinsics (deviation 22 — the reference decodes scaled pixels with
    the raw calibration, src/optic_flow.cpp:398 after :1604, biasing every
    velocity by exactly scale_factor; with the raw matrix this test reads
    ~half the true speed)."""
    published = []
    # config normalization divides frame/patch by scale_factor
    # (src/optic_flow.cpp:867-874): ask for 256/64 to land at 128/32
    node = _make_node(published, mrs_optic_flow={
        "scale_factor": 2.0, "frame_size": 256, "sample_point_size": 64,
    })
    assert node.config.frame_size == 128
    scene = SyntheticScene(width=320, height_px=320, fx=240.0, fy=240.0,
                           uav_height=HEIGHT, seed=23, texture_cutoff=0.3,
                           texture_scale=120.0)
    stream = FrameStream(node)
    v_true = (0.5, -0.3)
    scene.trajectory_events(stream, velocity=v_true, n_frames=6, dt=DT)
    stream.run()
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3, node.health
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    err = np.abs(v - np.array(v_true)).max(0)
    # effective focal is 120 px after the halving: ~0.5 px of correlation
    # noise maps to ~0.017 m/s; the un-fixed bias would be 0.25 m/s in x
    assert np.all(err < 0.15), (v.mean(0), v_true)
    # covariance follows the effective intrinsics
    assert twists[-1].covariance[0] == pytest.approx(
        (50.0 * HEIGHT / 120.0) ** 2)


def test_odometry_diff_ang_rate_source():
    """ang_rate_source=odometry_diff: per-frame orientation delta feeds the
    solution selection (src/optic_flow.cpp:1453-1464)."""
    published = []
    node = _make_node(published, ang_rate_source="odometry_diff")
    scene = SyntheticScene(uav_height=HEIGHT, seed=22)
    node.on_camera_info(scene.camera_info())
    yaw_rate = 0.2  # [rad/s] — slow enough not to disturb the flow scene
    # no IMU required in this mode; odometry carries orientation
    for i in range(5):
        t = 100.0 + i * DT
        yaw = yaw_rate * i * DT
        node.on_odometry(Odometry(
            stamp=t, orientation=(0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2))
        ))
        node.on_height(Float64Stamped(stamp=t, value=HEIGHT))
        pos = (0.5 * i * DT, 0.0)
        node.on_image(ImageMsg(stamp=t, data=scene.render(pos)))
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 2
    v = np.array([tw.linear[0] for tw in twists[1:]])
    assert np.abs(v - 0.5).max() < 0.15, v
    # the comparison quaternion must be in RATE units (angle/dt, the units
    # get_rt compares against) — the per-frame delta is yaw_rate * DT, so a
    # missing /dt would read 0.01 rad instead of 0.2 rad/s
    from mrs_optic_flow_tpu.utils.quat_np import np_rpy_from_quat

    rate_yaw = np_rpy_from_quat(np.asarray(node.angular_rate_quat))[2]
    np.testing.assert_allclose(rate_yaw, yaw_rate, rtol=1e-3)


@pytest.mark.slow
def test_scale_rotation_through_node():
    """scale_rotation: true -> the log-polar estimator publishes
    scale_rotation_out (wiring the reference left commented out,
    src/optic_flow.cpp:1629-1650)."""
    published = []
    node = _make_node(published, scale_rotation=True)
    scene = SyntheticScene(uav_height=HEIGHT, seed=23)
    stream = FrameStream(node)
    # hovering: the log-polar decode assumes rotation/scale about the image
    # centre; translation breaks it (true of the reference too)
    scene.trajectory_events(stream, velocity=(0.0, 0.0), n_frames=4, dt=DT)
    stream.run()
    sr = [m for t, m in published if t == "scale_rotation_out"]
    assert len(sr) >= 2
    # level flight at constant height: scale ~ 1, yaw rate ~ 0
    assert abs(sr[-1]["scale"] - 1.0) < 0.1
    assert abs(sr[-1]["yaw_rate"]) < 0.5


@pytest.mark.slow
def test_warmup_with_scale_rotation():
    """``warmup()`` pre-compiles the SR-fused frame programs too — every
    program call site must thread the estimator's precomputed log-polar
    weights (``node._sr_weights()``); the long-range warmup leg once missed
    the argument and broke only with ``scale_rotation: true``."""
    published = []
    # tiny geometry keeps the CPU compile fast; lp res 64 has the 8-fold
    # symmetry, so the precomputed-weight path (the one with the extra
    # program argument) is active
    node = _make_node(
        published,
        scale_rotation=True,
        scale_rot_lp_resolution=64,
        mrs_optic_flow={
            "frame_size": 128, "sample_point_size": 16, "scale_factor": 1,
        },
    )
    from mrs_optic_flow_tpu.runtime.msgs import CameraInfo

    # intrinsics sized to the tiny 128 px test frame (cx/cy centered)
    node.on_camera_info(CameraInfo(
        k=[120.0, 0, 64.0, 0, 120.0, 64.0, 0, 0, 1], d=[0.0] * 5))
    assert node.scale_rotation_estimator.lp_plan is not None
    assert node.warmup((128, 128)) > 0.0
    # warmup must not leak the synthetic frames into the SR carry
    assert bool(node.scale_rot_state.first)


@pytest.mark.slow
def test_scale_rotation_yaml_knobs():
    """scale_rot_interp / scale_rot_lp_resolution reach the estimator from
    the YAML surface (CLAUDE.md parity-knob convention) and drive end to
    end."""
    published = []
    node = _make_node(
        published,
        scale_rotation=True,
        scale_rot_interp="bilinear",
        scale_rot_lp_resolution=32,
    )
    est = node.scale_rotation_estimator
    assert est.config.interp == "bilinear"
    assert est.config.lp_res == 32
    scene = SyntheticScene(uav_height=HEIGHT, seed=23)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.0, 0.0), n_frames=3, dt=DT)
    stream.run()
    sr = [m for t, m in published if t == "scale_rotation_out"]
    assert len(sr) >= 1 and abs(sr[-1]["scale"] - 1.0) < 0.15


@pytest.mark.slow
def test_checkpoint_resume_scale_rotation(tmp_path):
    """The node checkpoint carries the scale/rotation log-polar state (like
    the FleetServer's prev_lp), so a resume keeps estimating instead of
    re-emitting the first-frame no-estimate (1, 0)."""
    published = []
    node = _make_node(
        published, scale_rotation=True, scale_rot_lp_resolution=32
    )
    scene = SyntheticScene(uav_height=HEIGHT, seed=23)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.0, 0.0), n_frames=3, dt=DT)
    stream.run()
    assert not bool(node.scale_rot_state.first)
    path = str(tmp_path / "state_sr.npz")
    node.save_state(path)

    published2 = []
    node2 = _make_node(
        published2, scale_rotation=True, scale_rot_lp_resolution=32
    )
    node2.load_state(path)
    assert not bool(node2.scale_rot_state.first)
    np.testing.assert_array_equal(
        np.asarray(node2.scale_rot_state.prev_logpolar),
        np.asarray(node.scale_rot_state.prev_logpolar),
    )
    node2.got_odometry = node2.got_imu = True
    t = 100.0 + 3 * DT
    node2.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
    node2.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
    node2.on_height(Float64Stamped(stamp=t, value=HEIGHT))
    node2._begin = t - DT
    node2.on_image(ImageMsg(stamp=t, data=scene.render((0.0, 0.0))))
    sr = [m for tp, m in published2 if tp == "scale_rotation_out"]
    assert len(sr) == 1  # a real estimate on the very first post-resume frame
    assert abs(sr[0]["scale"] - 1.0) < 0.15

    # a geometry-mismatched carry is rejected at load time
    node3 = _make_node([], scale_rotation=True, scale_rot_lp_resolution=64)
    with pytest.raises(ValueError, match="log-polar carry"):
        node3.load_state(path)


def test_stream_event_ordering():
    """FrameStream dispatches strictly by stamp regardless of add order."""
    from mrs_optic_flow_tpu.runtime.stream import FrameStream as FS

    seen = []

    class FakeNode:
        def on_height(self, m):
            seen.append(("h", m.stamp))
        def on_image(self, m):
            seen.append(("i", m.stamp))
        def on_imu(self, m):
            seen.append(("u", m.stamp))

    fs = FS(FakeNode())
    fs.add("image", 3.0, ImageMsg(stamp=3.0, data=np.zeros((2, 2))))
    fs.add("height", 1.0, Float64Stamped(stamp=1.0, value=2.0))
    fs.add("imu", 2.0, Imu(stamp=2.0, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
    fs.run()
    assert [s for s, _ in seen] == ["h", "u", "i"]


def test_e2e_tilted_flight():
    """Constant-tilt flight: rays rendered through the true tilted geometry;
    the detilt chain (src/optic_flow.cpp:1694-1746) must still recover the
    world-frame velocity in fcu_untilted."""
    from mrs_optic_flow_tpu.utils.quat_np import np_quat_from_rpy

    roll, pitch = 0.12, -0.08
    v_true = (0.6, -0.3)
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=HEIGHT, seed=30)
    node.on_camera_info(scene.camera_info())
    tilt_q = tuple(np_quat_from_rpy(roll, pitch, 0.0))
    for i in range(6):
        t = 100.0 + i * DT
        node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=tilt_q))
        node.on_odometry(Odometry(stamp=t, orientation=tilt_q))
        node.on_height(Float64Stamped(stamp=t, value=HEIGHT))
        pos = (v_true[0] * i * DT, v_true[1] * i * DT)
        node.on_image(ImageMsg(stamp=t, data=scene.render_pose(pos, (roll, pitch, 0.0))))
    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3, node.health
    v = np.array([tw.linear[:2] for tw in twists[1:]])
    err = np.abs(v - np.array(v_true)).max(0)
    assert np.all(err < 0.2), (v.mean(0), v_true)


@pytest.mark.slow
def test_node_block_matching_method():
    """Methods 3/5 end-to-end through the node (the reference refuses them,
    src/optic_flow.cpp:953-1011; here the single aggregated vector goes
    through the simple metric-scaling path)."""
    for method in (3, 5):
        published = []
        node = _make_node(
            published,
            mrs_optic_flow={
                "method": method, "frame_size": 96, "sample_point_size": 24,
                "scan_radius": 8, "step_size": 8,
            },
        )
        # texture_scale matched to the pixel footprint (h/f = 2 cm/px)
        # so the rendered frames are not aliased
        scene = SyntheticScene(
            uav_height=HEIGHT, width=128, height_px=128, fx=100.0, fy=100.0,
            texture_cutoff=0.35, texture_scale=50.0, seed=31,
        )
        node.on_camera_info(scene.camera_info())
        v = (0.4, -0.2)
        for i in range(4):
            t = 100.0 + i * DT
            node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
            node.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
            node.on_height(Float64Stamped(stamp=t, value=HEIGHT))
            pos = (v[0] * i * DT, v[1] * i * DT)
            node.on_image(ImageMsg(stamp=t, data=scene.render(pos)))
        twists = [m for t, m in published if t == "velocity_out"]
        assert len(twists) >= 2, (method, node.health)
        got = np.array([tw.linear[:2] for tw in twists[1:]]).mean(0)
        # integer-pixel engines at 100 px focal / 2 m height: ~0.4 m/s per px
        assert np.abs(got - np.array(v)).max() < 0.45, (method, got)


@pytest.mark.slow
def test_filter_method_variants():
    """filter_method (allsac / ransac / average) is live on the
    block-matching path — per-cell velocities consensus-fused."""
    for fm in ("allsac", "ransac", "average"):
        published = []
        node = _make_node(
            published,
            mrs_optic_flow={
                "method": 3, "frame_size": 96, "sample_point_size": 24,
                "scan_radius": 8, "step_size": 8, "filter_method": fm,
            },
        )
        scene = SyntheticScene(
            uav_height=HEIGHT, width=128, height_px=128, fx=100.0, fy=100.0,
            texture_cutoff=0.35, texture_scale=50.0, seed=32,
        )
        node.on_camera_info(scene.camera_info())
        v = (0.4, 0.0)
        for i in range(4):
            t = 100.0 + i * DT
            node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
            node.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
            node.on_height(Float64Stamped(stamp=t, value=HEIGHT))
            node.on_image(ImageMsg(stamp=t, data=scene.render((v[0] * i * DT, 0.0))))
        twists = [m for t, m in published if t == "velocity_out"]
        assert len(twists) >= 2, (fm, node.health)
        got = np.array([tw.linear[0] for tw in twists[1:]]).mean()
        assert abs(got - v[0]) < 0.45, (fm, got)


def test_processing_latency_topic():
    """Every processed frame publishes its wall latency on
    processing_latency_out (the metric the reference's profiler only
    logs; SURVEY.md section 5)."""
    published = []
    node = _make_node(published)
    scene = SyntheticScene(uav_height=2.0)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.5, 0.0), n_frames=4, dt=0.05)
    stream.run()
    lats = [m for t, m in published if t == "processing_latency_out"]
    assert len(lats) >= 3  # every non-gated frame reports
    assert all(0.0 < v < 120.0 for v in lats)


def test_transform_provider_polling():
    """Pluggable transform provider (the reference's 1 Hz timerTf,
    src/optic_flow.cpp:1165-1243): polled at most once per second from the
    image path, a raising provider counts as a failed lookup
    (the TransformException sleep-and-retry path), and on success polling
    stops for good."""
    calls = []

    def provider():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("tf tree not ready")
        if len(calls) == 2:
            return None
        return (0.0, 0.0, 0.0, 1.0)

    node = OpticFlowNode(
        load_config(), publish=lambda t, m: None, log=lambda s: None,
        transform_provider=provider,
    )
    node.got_odometry = node.got_imu = True
    img = np.zeros((480, 752), np.float32)

    # three frames inside one second: exactly ONE poll (which raises)
    for stamp in (0.0, 0.1, 0.2):
        node.on_image(ImageMsg(stamp=stamp, data=img))
    assert len(calls) == 1 and not node.got_tfs

    node.on_image(ImageMsg(stamp=1.05, data=img))  # second poll: None
    assert len(calls) == 2 and not node.got_tfs

    node.on_image(ImageMsg(stamp=2.1, data=img))  # third poll: success
    assert len(calls) == 3 and node.got_tfs
    # cam_yaw defaults to yaw(inverse(c2b)) + pi/2 (src/optic_flow.cpp:1206-1208)
    assert abs(node.cam_yaw - np.pi / 2) < 1e-9

    node.on_image(ImageMsg(stamp=3.2, data=img))  # never polled again
    assert len(calls) == 3


def test_checkpoint_cross_carry_dtype(tmp_path):
    """A float32-carry checkpoint (round 1 / tpu.quantize_8bit: false)
    resumes cleanly into the 8-bit-carry engine: prev is rounded to the
    engine's dtype on load."""
    from mrs_optic_flow_tpu.runtime.node import OpticFlowNode

    f32_node = OpticFlowNode(
        load_config(overrides={"tpu": {"quantize_8bit": False}}),
        publish=lambda t, m: None, log=lambda s: None,
    )
    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 255, size=(480, 480)).astype(np.float32)
    f32_node.flow_state = f32_node.engine.set_im_prev(
        f32_node.flow_state, frame
    )
    path = str(tmp_path / "ckpt")
    f32_node.save_state(path)

    u8_node = OpticFlowNode(
        load_config(), publish=lambda t, m: None, log=lambda s: None,
    )
    u8_node.load_state(path)
    import jax.numpy as jnp

    assert u8_node.flow_state.prev.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(u8_node.flow_state.prev),
        np.clip(np.round(frame), 0, 255).astype(np.uint8),
    )


# ------------------------------------------------------------------ #
# tpu.host_preprocess — native fused gray+crop before the dispatch    #
# ------------------------------------------------------------------ #


def _as_bgr_u8(frame_f32: np.ndarray) -> np.ndarray:
    q = np.clip(np.round(frame_f32), 0, 255).astype(np.uint8)
    return np.repeat(q[:, :, None], 3, axis=2)


class _NativeSpy:
    """Counting proxy for the node's resolved native binding."""

    def __init__(self):
        from mrs_optic_flow_tpu import native

        self._native = native
        self.gray_crops = 0
        self.crops = 0

    def gray_crop(self, *a, **kw):
        self.gray_crops += 1
        return self._native.gray_crop(*a, **kw)

    def crop(self, *a, **kw):
        self.crops += 1
        return self._native.crop(*a, **kw)


def _run_host_pre_stream(published, *, bgr: bool, host_preprocess: bool):
    node = _make_node(
        published, tpu={"host_preprocess": host_preprocess} if host_preprocess else {}
    )
    spy = _NativeSpy()
    node._host_pre = spy  # skip lazy resolution; count native calls
    scene = SyntheticScene(uav_height=HEIGHT, seed=4)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=V_TRUE, n_frames=6, dt=DT)
    if bgr:
        for ev in stream._events:
            if ev.kind == "image":
                ev.msg.data = _as_bgr_u8(ev.msg.data)
    stream.run()
    return node, spy


@pytest.mark.slow
def test_host_preprocess_matches_device_path():
    """tpu.host_preprocess: the native fused uint8 gray+crop feeds the
    pre-cropped device program and the twists match the on-device
    preprocessing (same crop corner, ops/preprocess.py::center_crop; same
    fixed-point 8U gray contract, src/optic_flow.cpp:1602-1622)."""
    pub_host, pub_dev = [], []
    node_h, spy_h = _run_host_pre_stream(pub_host, bgr=True, host_preprocess=True)
    _node_d, spy_d = _run_host_pre_stream(pub_dev, bgr=True, host_preprocess=False)

    assert spy_h.gray_crops >= 5, "host path must run the native kernel"
    assert spy_d.gray_crops == 0 and spy_d.crops == 0

    tw_h = [m for t, m in pub_host if t == "velocity_out"]
    tw_d = [m for t, m in pub_dev if t == "velocity_out"]
    assert len(tw_h) == len(tw_d) >= 3
    v_h = np.array([tw.linear[:2] for tw in tw_h])
    v_d = np.array([tw.linear[:2] for tw in tw_d])
    np.testing.assert_allclose(v_h, v_d, atol=1e-3)
    assert np.abs(v_h[1:] - np.array(V_TRUE)).max() < 0.15


@pytest.mark.slow
def test_host_preprocess_fallbacks():
    """Ineligible inputs (float32 frames) fall back to device preprocessing;
    an unavailable native library disables the path without breaking the
    stream."""
    published = []
    _node, spy = _run_host_pre_stream(published, bgr=False, host_preprocess=True)
    assert spy.gray_crops == 0 and spy.crops == 0  # float32 -> ineligible
    tw = [m for t, m in published if t == "velocity_out"]
    assert len(tw) >= 3
    assert np.abs(np.array(tw[-1].linear[:2]) - np.array(V_TRUE)).max() < 0.15

    published2 = []
    node = _make_node(published2, tpu={"host_preprocess": True})
    node._host_pre = False  # the lazy resolution's "unavailable" terminal state
    scene = SyntheticScene(uav_height=HEIGHT, seed=4)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=V_TRUE, n_frames=4, dt=DT)
    for ev in stream._events:
        if ev.kind == "image":
            ev.msg.data = _as_bgr_u8(ev.msg.data)
    stream.run()
    assert len([m for t, m in published2 if t == "velocity_out"]) >= 2


def test_host_preprocess_gray_contract():
    """The native gray+crop equals the device preprocess chain (grayscale ->
    crop -> 8U quantize) within 1 LSB: the device float mix vs OpenCV's
    fixed-point weights (native/src/of_runtime.cpp::ofp_gray_crop)."""
    import jax.numpy as jnp

    from mrs_optic_flow_tpu import native
    from mrs_optic_flow_tpu.ops.preprocess import (
        center_crop,
        quantize_u8,
        to_grayscale,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(480, 752, 3), dtype=np.uint8)
    cx = 376
    host = native.gray_crop(img, cx, 240, 480)
    dev = np.asarray(
        quantize_u8(center_crop(to_grayscale(jnp.asarray(img)), 480, cx))
    )
    assert host.shape == dev.shape == (480, 480)
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1


@pytest.mark.slow
def test_node_block_matching_with_scale_rotation():
    """scale_rotation: true on a block-matching engine (method 3): the
    estimator is engine-agnostic and FUSED into the simple frame program —
    previously it was built and then silently never stepped or published
    (the scale_rotation_out topic just disappeared)."""
    published = []
    node = _make_node(
        published,
        scale_rotation=True,
        mrs_optic_flow={
            "method": 3, "frame_size": 96, "sample_point_size": 24,
            "scan_radius": 8, "step_size": 8,
        },
    )
    scene = SyntheticScene(
        uav_height=HEIGHT, width=128, height_px=128, fx=100.0, fy=100.0,
        texture_cutoff=0.35, texture_scale=50.0, seed=31,
    )
    node.on_camera_info(scene.camera_info())
    for i in range(4):
        t = 100.0 + i * DT
        node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
        node.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
        node.on_height(Float64Stamped(stamp=t, value=HEIGHT))
        node.on_image(ImageMsg(stamp=t, data=scene.render((0.02 * i, 0.0))))
    sr = [m for t, m in published if t == "scale_rotation_out"]
    assert len(sr) >= 3, node.health
    # hovering translation: the decode exists and sits near the no-change
    # point (scale ~1 -> vz ~0, yaw_rate ~0)
    for m in sr[1:]:
        assert np.isfinite(m["scale"]) and abs(m["scale"] - 1.0) < 0.2, m
        assert np.isfinite(m["yaw_rate"]), m
    # the velocity path still publishes alongside
    assert any(t == "velocity_out" for t, _ in published)
