"""Native feeder: threaded capture -> queue -> node pipeline."""

import time

import numpy as np
import pytest

from mrs_optic_flow_tpu import native
from mrs_optic_flow_tpu.config import load_config
from mrs_optic_flow_tpu.runtime import OpticFlowNode, SyntheticScene
from mrs_optic_flow_tpu.runtime.msgs import CameraInfo, Float64Stamped, Imu, Odometry

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_feeder_end_to_end():
    published = []
    node = OpticFlowNode(
        load_config(), publish=lambda t, m: published.append((t, m)), log=lambda s: None
    )
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    scene = SyntheticScene(uav_height=2.0, seed=9)
    node.on_camera_info(scene.camera_info())

    from mrs_optic_flow_tpu.runtime.feeder import NativeFeeder

    feeder = NativeFeeder(node, width=752, height=480, realtime=False)

    v = (0.9, 0.2)
    dt = 0.05
    for i in range(6):
        t = 100.0 + i * dt
        node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
        node.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
        node.on_height(Float64Stamped(stamp=t, value=2.0))
        gray = scene.render((v[0] * i * dt, v[1] * i * dt))
        bgr = np.repeat(gray[..., None].astype(np.uint8), 3, axis=-1)
        assert feeder.push(bgr, t)
        assert feeder.feed_once()

    twists = [m for t, m in published if t == "velocity_out"]
    assert len(twists) >= 3
    vel = np.array([tw.linear[:2] for tw in twists[1:]])
    assert np.abs(vel - np.array(v)).max() < 0.2, vel.mean(0)


def test_feeder_rejects_mismatched_geometry():
    """The fused native crop path has no resize stage and must not silently
    disagree with the node's crop geometry (scale_factor, edge principal
    points) — both misconfigurations fail loudly."""
    import pytest

    from mrs_optic_flow_tpu.runtime.feeder import NativeFeeder

    node = OpticFlowNode(
        load_config(overrides={"mrs_optic_flow": {"scale_factor": 2.0}}),
        publish=lambda t, m: None, log=lambda s: None,
    )
    with pytest.raises(ValueError, match="scale_factor"):
        NativeFeeder(node, width=752, height=480)

    node2 = OpticFlowNode(load_config(), publish=lambda t, m: None, log=lambda s: None)
    node2.set_transforms((0.0, 0.0, 0.0, 1.0))
    # principal point so close to the edge the 480 px crop cannot fit: the
    # native clamp and the node's unclamped ul_x would disagree by 140 px
    node2.on_camera_info(CameraInfo(
        k=[420.0, 0, 100.0, 0, 420.0, 240.0, 0, 0, 1], d=[0.0] * 5
    ))
    feeder = NativeFeeder(node2, width=752, height=480)
    frame = np.zeros((480, 752, 3), np.uint8)
    with pytest.raises(ValueError, match="does not fit"):
        feeder._preprocess(frame)


def test_feeder_realtime_drains_to_newest():
    published = []
    node = OpticFlowNode(load_config(), publish=lambda t, m: published.append((t, m)),
                         log=lambda s: None)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    scene = SyntheticScene(uav_height=2.0, seed=10)
    node.on_camera_info(scene.camera_info())

    from mrs_optic_flow_tpu.runtime.feeder import NativeFeeder

    feeder = NativeFeeder(node, width=752, height=480, realtime=True)
    gray = scene.render((0.0, 0.0))
    bgr = np.repeat(gray[..., None].astype(np.uint8), 3, axis=-1)
    for i in range(5):
        feeder.push(bgr, 100.0 + i * 0.01)
    assert feeder.feed_once()
    assert feeder.frames_skipped == 4
    assert len(feeder.queue) == 0


def test_fleet_feeder(rng):
    """N native rings -> one batched fleet tick; empty rings carry state,
    stale frames drain to newest with skip accounting."""
    import jax.numpy as jnp  # noqa: F401  (ensures jax initialized on CPU)

    from oracle import smooth_random_image

    from mrs_optic_flow_tpu.parallel import BatchPipeline
    from mrs_optic_flow_tpu.runtime import FleetFeeder, FleetServer

    K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]], np.float32)
    pipe = BatchPipeline(frame_size=64, sample_point_size=16, camera_matrix=K,
                         dist_coeffs=np.zeros(5, np.float32),
                         ransac_iterations=32)
    n = 3
    fleet = FleetServer(pipe, n)
    feeder = FleetFeeder(fleet, frame_shape=(64, 64))
    base = (smooth_random_image(np.random.default_rng(0), 64) * 127 + 128
            ).astype(np.uint8)
    heights = [2.0] * n

    # tick 0: all streams push -> first-frame tick (all gated)
    for i in range(n):
        assert feeder.push(i, base, 0.0)
    t0 = feeder.tick(heights)
    assert t0 is not None and not np.any(np.asarray(t0.ok))

    # tick 1: stream 1 silent; stream 2 pushes TWO frames (older one skipped)
    moved = np.roll(base, 2, axis=1)
    feeder.push(0, moved, 0.1)
    feeder.push(2, base, 0.05)
    feeder.push(2, moved, 0.1)
    t1 = feeder.tick(heights)
    t1 = t1.materialize()
    assert t1.ok[0] and not t1.ok[1] and t1.ok[2]
    assert feeder.frames_skipped == 1
    med = np.nanmedian(t1.shifts[0], axis=0)
    np.testing.assert_allclose(med, [2.0, 0.0], atol=0.3)

    # empty tick: nothing pushed
    assert feeder.tick(heights) is None
