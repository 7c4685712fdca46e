"""Batched serving loop + failure injection."""

import numpy as np
import pytest

from mrs_optic_flow_tpu.parallel import BatchPipeline
from mrs_optic_flow_tpu.runtime.serving import ServingLoop, ServingRequest

from oracle import smooth_random_image

K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]], np.float32)


def _requests(rng, n, frame=48):
    reqs = []
    for i in range(n):
        prev = smooth_random_image(rng, 64)
        dx = int(rng.integers(-3, 4))
        curr = np.roll(prev, dx, axis=1)
        reqs.append(
            ServingRequest(prev=prev, curr=curr, height=2.0, dt=0.05)
        )
    return reqs


def test_serving_loop_batches(rng):
    pipe = BatchPipeline(
        frame_size=48, sample_point_size=12, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )
    loop = ServingLoop(pipe, batch_size=4)
    reqs = _requests(rng, 10)  # 2 full batches + remainder of 2
    results = list(loop.run(reqs))
    assert len(results) == 10
    assert all(r.shifts.shape == (16, 2) for r in results)
    # at least the clean small-shift pairs produce valid motion
    assert sum(r.ok for r in results) >= 5


@pytest.mark.slow
def test_serving_uint8_matches_float32(rng):
    """uint8 frames cross host->device as-is (4x fewer bytes) and must give
    bit-identical results to pre-converted float32 frames (the pipeline casts
    on device, mirroring the reference's host convertTo ``src/FftMethod.cpp:1805``)."""
    pipe = BatchPipeline(
        frame_size=48, sample_point_size=12, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )

    def run(dtype):
        loop = ServingLoop(pipe, batch_size=4)
        reqs = []
        for i in range(6):
            img = smooth_random_image(np.random.default_rng(i), 64)
            prev = (img * 255).astype(np.uint8)  # quantize once, shared by both paths
            curr = np.roll(prev, (i % 3) - 1, axis=1)
            reqs.append(ServingRequest(
                prev=prev.astype(dtype), curr=curr.astype(dtype),
                height=2.0, dt=0.05))
        return list(loop.run(reqs))

    r8, r32 = run(np.uint8), run(np.float32)
    for a, b in zip(r8, r32):
        np.testing.assert_array_equal(a.shifts, b.shifts)
        np.testing.assert_array_equal(a.tran, b.tran)
        assert a.ok == b.ok
    # float64 client frames are normalized to float32 on the host (not
    # shipped at 8 bytes/px, no per-dtype recompile)
    r64 = run(np.float64)
    for a, b in zip(r64, r32):
        np.testing.assert_array_equal(a.shifts, b.shifts)


def test_serving_partial_batch(rng):
    pipe = BatchPipeline(
        frame_size=48, sample_point_size=12, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )
    loop = ServingLoop(pipe, batch_size=8)
    results = list(loop.run(_requests(rng, 3)))  # less than one batch
    assert len(results) == 3


def test_node_contains_bad_frames():
    """A malformed frame (wrong size) is contained, logged, and counted."""
    from mrs_optic_flow_tpu.config import load_config
    from mrs_optic_flow_tpu.runtime import OpticFlowNode, SyntheticScene
    from mrs_optic_flow_tpu.runtime.msgs import Float64Stamped, ImageMsg, Imu, Odometry

    logs = []
    node = OpticFlowNode(load_config(), publish=lambda t, m: None, log=logs.append)
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    scene = SyntheticScene(uav_height=2.0, seed=20)
    node.on_camera_info(scene.camera_info())
    t = 100.0
    node.on_imu(Imu(stamp=t, angular_velocity=(0, 0, 0), orientation=(0, 0, 0, 1)))
    node.on_odometry(Odometry(stamp=t, orientation=(0, 0, 0, 1)))
    node.on_height(Float64Stamped(stamp=t, value=2.0))
    node.on_image(ImageMsg(stamp=t, data=scene.render((0, 0))))  # first frame
    # too-small frame: crop would slice out of range
    bad = np.zeros((64, 64), np.float32)
    out = node.on_image(ImageMsg(stamp=t + 0.05, data=bad))
    assert out is None
    assert node.health["consecutive_failures"] >= 1
    assert any("failed" in s for s in logs)
    # stream recovers on the next good frame
    good = scene.render((0.05, 0.0))
    out = node.on_image(ImageMsg(stamp=t + 0.10, data=good))
    assert out is not None
    assert node.health["consecutive_failures"] == 0




@pytest.mark.parametrize("depth", [1, 4])
def test_serving_depth_pipelining(rng, depth):
    """Any pipeline depth returns every result, in request order."""
    pipe = BatchPipeline(
        frame_size=48, sample_point_size=12, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )
    loop = ServingLoop(pipe, batch_size=2, depth=depth)
    reqs = _requests(rng, 9)  # 4 full batches + remainder
    results = list(loop.run(reqs))
    assert len(results) == 9
    # order: re-run with depth=2 (the old double-buffer) and compare shifts
    ref = list(ServingLoop(pipe, batch_size=2, depth=2).run(reqs))
    for a, b in zip(results, ref):
        np.testing.assert_allclose(a.shifts, b.shifts, atol=1e-5, equal_nan=True)


@pytest.mark.slow
def test_serving_carries_scale_rotation(rng):
    """A pipeline built with ``scale_rotation=`` surfaces per-pair scale /
    rotation through ServingLoop (stateless pairs: both frames resampled —
    ``ScaleRotationEstimator.step_batch``); a plain pipeline reports NaN."""
    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator

    K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]], np.float32)
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    reqs = [
        ServingRequest(prev=base, curr=np.roll(base, 1, axis=1),
                       height=2.0, dt=0.1)
        for _ in range(3)
    ]
    sr = ScaleRotationEstimator(ScaleRotationConfig(resolution=64, magnitude=15.0))
    pipe = BatchPipeline(
        frame_size=64, sample_point_size=16, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
        scale_rotation=sr,
    )
    out = list(ServingLoop(pipe, batch_size=2).run(reqs))
    assert len(out) == 3
    # a pure translation is a small perturbation in log-polar space: the
    # estimate exists (finite) and decodes near the no-change point
    assert all(np.isfinite(r.scale) and abs(r.scale - 1.0) < 0.2 for r in out)
    assert all(np.isfinite(r.rotation) for r in out)

    plain = BatchPipeline(
        frame_size=64, sample_point_size=16, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )
    out_plain = list(ServingLoop(plain, batch_size=2).run(reqs))
    assert all(np.isnan(r.scale) and np.isnan(r.rotation) for r in out_plain)
