"""FleetServer: per-stream state + batched dispatch semantics."""

import pytest

import numpy as np

import jax.numpy as jnp

from mrs_optic_flow_tpu.parallel import BatchPipeline
from mrs_optic_flow_tpu.runtime import FleetServer

from oracle import smooth_random_image

K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1.0]], np.float32)


def _pipeline():
    return BatchPipeline(
        frame_size=64, sample_point_size=16, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
    )


def _fleet_frames(rng, n, t, base):
    """Stream i's frame at tick t: the shared texture rolled by i px/tick in
    x and (i % 2) px/tick in y — per-stream constant pixel velocity."""
    return np.stack(
        [np.roll(base, (t * (i % 2), t * (1 + i % 3)), (0, 1)) for i in range(n)]
    )


@pytest.mark.slow
def test_fleet_recovers_per_stream_velocity(rng):
    n = 4
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    fleet = FleetServer(_pipeline(), n)
    heights = np.full(n, 2.0)

    t0 = fleet.tick(_fleet_frames(rng, n, 0, base), np.zeros(n), heights)
    assert not np.any(np.asarray(t0.ok))  # first frames: everything gated

    tick = fleet.tick(
        _fleet_frames(rng, n, 1, base), np.full(n, 0.1), heights
    ).materialize()
    assert tick.ok.shape == (n,)
    # per-stream median flow must match each stream's own roll, not a fleet
    # average: content moved (dx, dy) = (1 + i % 3, i % 2); shifts report
    # content motion (positive = content moved +x)
    for i in range(n):
        med = np.nanmedian(tick.shifts[i], axis=0)
        expect = np.array([1 + i % 3, i % 2], float)
        assert np.abs(med - expect).max() < 0.3, (i, med, expect)


def test_fleet_mask_and_state_carry(rng):
    n = 3
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    fleet = FleetServer(_pipeline(), n)
    heights = np.full(n, 2.0)

    fleet.tick(_fleet_frames(rng, n, 0, base), np.zeros(n), heights)
    # stream 1 drops a frame on tick 1
    mask = np.array([True, False, True])
    t1 = fleet.tick(
        _fleet_frames(rng, n, 1, base), np.full(n, 0.1), heights, mask=mask
    ).materialize()
    assert not t1.ok[1]  # no frame, no estimate
    # on tick 2 stream 1 returns: its prev is still the tick-0 frame, so the
    # measured shift spans TWO ticks of motion
    t2 = fleet.tick(
        _fleet_frames(rng, n, 2, base), np.full(n, 0.2), heights
    ).materialize()
    med = np.nanmedian(t2.shifts[1], axis=0)
    np.testing.assert_allclose(med, [2 * 2, 2 * 1], atol=0.3)
    assert abs(t2.dts[1] - 0.2) < 1e-9  # dt spans the dropped tick
    assert abs(t2.dts[0] - 0.1) < 1e-9


def test_fleet_reset_regates_first_frame(rng):
    n = 2
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    fleet = FleetServer(_pipeline(), n)
    heights = np.full(n, 2.0)
    fleet.tick(_fleet_frames(rng, n, 0, base), np.zeros(n), heights)
    fleet.reset(0)  # camera 0 reconnects
    t1 = fleet.tick(
        _fleet_frames(rng, n, 1, base), np.full(n, 0.1), heights
    ).materialize()
    assert not t1.ok[0]  # fresh first frame for stream 0
    t2 = fleet.tick(
        _fleet_frames(rng, n, 2, base), np.full(n, 0.2), heights
    ).materialize()
    assert t2.ok[0]


def test_fleet_long_range_mode(rng):
    """Fleet in long-range mode: 4x-downsampled flow + get2DT, per-stream
    metric velocity from large shifts (takeoff scenario)."""
    n = 3
    base = (smooth_random_image(rng, 96, cutoff=0.4) * 127 + 128).astype(np.uint8)
    pipe = BatchPipeline(frame_size=96, sample_point_size=24, camera_matrix=K,
                         dist_coeffs=np.zeros(5, np.float32), crop_cx=48.0)
    fleet = FleetServer(pipe, n, long_range=True)
    heights = np.full(n, 3.0)

    def frames(t):
        return np.stack([np.roll(base, (0, 8 * t * (i + 1)), (0, 1)) for i in range(n)])

    fleet.tick(frames(0), np.zeros(n), heights)
    tick = fleet.tick(frames(1), np.full(n, 0.1), heights).materialize()
    assert tick.shifts.shape == (n, 1, 2)  # coarse long-range grid
    assert np.all(tick.ok)
    # v = -shift_ds * ratio * h / f / dt; content moved 8*(i+1) px
    for i in range(n):
        expect_vx = -8.0 * (i + 1) * 3.0 / 40.0 / 0.1
        np.testing.assert_allclose(tick.tran[i][0], expect_vx, rtol=0.15)
        assert abs(tick.tran[i][1]) < abs(expect_vx) * 0.15

    # per-stream attitude tilt-corrects the height before get2DT,
    # h / (cos(pitch) * cos(roll)) — src/optic_flow.cpp:1780-1781
    fleet2 = FleetServer(pipe, n, long_range=True)
    fleet2.tick(frames(0), np.zeros(n), heights)
    ang = np.full(n, 0.4)
    tilted = fleet2.tick(
        frames(1), np.full(n, 0.1), heights, rolls=ang, pitches=ang
    ).materialize()
    scale = 1.0 / (np.cos(0.4) * np.cos(0.4))
    np.testing.assert_allclose(
        tilted.tran[:, 0], tick.tran[:, 0] * scale, rtol=1e-5
    )


def test_fleet_bgr_frames(rng):
    """[N, H, W, 3] BGR frames go through fleet preprocessing (grayscale +
    crop on device) and state carry."""
    n = 2
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    bgr = np.stack([base] * 3, axis=-1)
    fleet = FleetServer(_pipeline(), n)
    heights = np.full(n, 2.0)

    def frames(t):
        return np.stack([np.roll(bgr, (0, 2 * t, 0), (0, 1, 2)) for _ in range(n)])

    fleet.tick(frames(0), np.zeros(n), heights)
    tick = fleet.tick(frames(1), np.full(n, 0.1), heights).materialize()
    assert np.all(tick.ok)
    med = np.nanmedian(tick.shifts[0], axis=0)
    np.testing.assert_allclose(med, [2.0, 0.0], atol=0.3)


def test_fleet_checkpoint_resume(tmp_path, rng):
    """A restarted fleet resumes from the checkpoint without first-frame
    glitches and produces the same estimates as the uninterrupted one."""
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    n = 2
    heights = np.full(n, 2.0)

    def frames(t):
        return np.stack([np.roll(base, (0, 2 * t), (0, 1)) for _ in range(n)])

    pipe = _pipeline()
    a = FleetServer(pipe, n)
    a.tick(frames(0), np.zeros(n), heights)
    path = str(tmp_path / "fleet.npz")
    a.save_state(path)
    cont = a.tick(frames(1), np.full(n, 0.1), heights).materialize()

    b = FleetServer(pipe, n)
    b.load_state(path)
    resumed = b.tick(frames(1), np.full(n, 0.1), heights).materialize()
    assert np.array_equal(resumed.ok, cont.ok) and np.all(resumed.ok)
    np.testing.assert_allclose(resumed.shifts, cont.shifts, atol=1e-5, equal_nan=True)

    # mode mismatch is refused
    import pytest as _pytest

    c = FleetServer(pipe, n, long_range=True)
    with _pytest.raises(ValueError):
        c.load_state(path)
    # stream-count mismatch is refused (broadcasting would silently
    # stretch the state otherwise)
    d = FleetServer(pipe, n + 1)
    with _pytest.raises(ValueError, match="streams"):
        d.load_state(path)
    # suffix-free paths round-trip (np.savez appends .npz on write)
    bare = str(tmp_path / "fleet2")
    a.save_state(bare)
    b2 = FleetServer(pipe, n)
    b2.load_state(bare)


def test_fleet_scale_rotation_hook(rng):
    """FleetServer with a ScaleRotationEstimator fills per-stream
    scale/rotation each tick (NaN on invalid ticks), carrying the log-polar
    image on device (``step_batch_carried``)."""
    import cv2

    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator

    n = 2
    sr = ScaleRotationEstimator(ScaleRotationConfig(resolution=64, magnitude=15.0))
    fleet = FleetServer(_pipeline(), n, scale_rotation=sr)
    heights = np.full(n, 2.0)

    # 64 px log-polar rows give Ky = 64/360 ~ 0.18 px/deg, so use angles
    # large enough to move the peak by >= 2 px
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    deg = [20.0, -14.0]
    rot = [
        cv2.warpAffine(
            base.astype(np.float32),
            cv2.getRotationMatrix2D((32.0, 32.0), d, 1.0),
            (64, 64),
        )
        for d in deg
    ]

    t0 = fleet.tick(np.stack([base] * n), np.zeros(n), heights)
    assert t0.scale is not None and np.all(np.isnan(np.asarray(t0.scale)))

    t1 = fleet.tick(np.stack(rot), np.full(n, 0.1), heights).materialize()
    assert t1.scale.shape == (n,) and t1.rotation.shape == (n,)
    for i in range(n):
        assert abs(t1.rotation[i] - np.deg2rad(deg[i])) < np.deg2rad(3.0), (
            i, t1.rotation[i], deg[i],
        )
        assert abs(t1.scale[i] - 1.0) < 0.06

    # resolution mismatch is refused
    import pytest as _pytest

    bad = ScaleRotationEstimator(ScaleRotationConfig(resolution=48))
    with _pytest.raises(ValueError, match="resolution"):
        FleetServer(_pipeline(), n, scale_rotation=bad)


def test_fleet_checkpoint_logpolar_carry_validated(tmp_path, rng):
    """A checkpoint carrying a log-polar state is refused at load time when
    the receiving server has no scale/rotation estimator or a different
    log-polar geometry — instead of crashing deep inside the next tick."""
    import pytest as _pytest

    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator

    n = 2
    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    heights = np.full(n, 2.0)
    sr = ScaleRotationEstimator(ScaleRotationConfig(resolution=64, magnitude=15.0))
    a = FleetServer(_pipeline(), n, scale_rotation=sr)
    a.tick(np.stack([base] * n), np.zeros(n), heights)
    path = str(tmp_path / "fleet_lp.npz")
    a.save_state(path)

    # same geometry resumes fine
    b = FleetServer(_pipeline(), n, scale_rotation=sr)
    b.load_state(path)
    t = b.tick(np.stack([base] * n), np.full(n, 0.1), heights).materialize()
    assert t.scale.shape == (n,)

    # no estimator on the receiving server
    c = FleetServer(_pipeline(), n)
    with _pytest.raises(ValueError, match="scale_rotation"):
        c.load_state(path)

    # different log-polar geometry
    sr_small = ScaleRotationEstimator(
        ScaleRotationConfig(resolution=64, lp_resolution=32, magnitude=15.0)
    )
    d = FleetServer(_pipeline(), n, scale_rotation=sr_small)
    with _pytest.raises(ValueError, match="log-polar"):
        d.load_state(path)


@pytest.mark.slow
def test_fleet_scale_rotation_fused_in_pipeline(rng):
    """A pipeline built with ``scale_rotation=`` runs the SR leg INSIDE the
    tick program (one dispatch: ``BatchPipeline.step_pre_carried``); the
    fused results match the legacy two-dispatch path to float tolerance."""
    import cv2

    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator

    n = 2
    sr = ScaleRotationEstimator(ScaleRotationConfig(resolution=64, magnitude=15.0))
    pipe_fused = BatchPipeline(
        frame_size=64, sample_point_size=16, camera_matrix=K,
        dist_coeffs=np.zeros(5, np.float32), ransac_iterations=32,
        scale_rotation=sr,
    )
    fused = FleetServer(pipe_fused, n)  # estimator inherited from the pipeline
    assert fused._sr_fused and fused.scale_rotation is sr
    legacy = FleetServer(_pipeline(), n, scale_rotation=sr)
    assert not legacy._sr_fused

    base = (smooth_random_image(rng, 64) * 127 + 128).astype(np.uint8)
    deg = [16.0, -10.0]
    rot = np.stack([
        cv2.warpAffine(
            base.astype(np.float32),
            cv2.getRotationMatrix2D((32.0, 32.0), d, 1.0),
            (64, 64),
        )
        for d in deg
    ])
    heights = np.full(n, 2.0)
    for fleet in (fused, legacy):
        fleet.tick(np.stack([base] * n), np.zeros(n), heights)
    tf = fused.tick(rot, np.full(n, 0.1), heights).materialize()
    tl = legacy.tick(rot, np.full(n, 0.1), heights).materialize()
    for i in range(n):
        assert abs(tf.rotation[i] - np.deg2rad(deg[i])) < np.deg2rad(3.0)
    np.testing.assert_allclose(tf.rotation, tl.rotation, atol=1e-5)
    np.testing.assert_allclose(tf.scale, tl.scale, atol=1e-5)
    np.testing.assert_allclose(tf.tran, tl.tran, atol=1e-4, equal_nan=True)

    # pipeline/estimator geometry mismatch is refused at construction
    import pytest as _pytest

    with _pytest.raises(ValueError, match="resolution"):
        BatchPipeline(
            frame_size=64, sample_point_size=16, camera_matrix=K,
            dist_coeffs=np.zeros(5, np.float32),
            scale_rotation=ScaleRotationEstimator(
                ScaleRotationConfig(resolution=48)
            ),
        )


def test_fleet_long_range_rate_feed_forward(rng):
    """Fleet LR wiring of the per-stream roll/pitch-rate feed-forward
    (deviation 21): identical frames per tick measure ZERO flow, so every
    stream's published velocity is exactly get_2dt's correction for its
    own rates — catching any axis swap or ordering bug between
    FleetServer.tick, the pipeline's vmapped step, and get_2dt (incl. the
    derived identity-mount cam_yaw = pi/2 default)."""
    import jax.numpy as jnp

    from mrs_optic_flow_tpu.geometry.motion import get_2dt

    n, h, dt = 4, 2.0, 0.05
    base = (smooth_random_image(rng, 64, cutoff=0.4) * 0.5 + 64).astype(np.uint8)
    frames = np.stack([base] * n)
    pipe = _pipeline()
    fleet = FleetServer(pipe, n, long_range=True)
    assert fleet.cam_yaw == pytest.approx(np.pi / 2)  # identity mount

    fleet.tick(frames, np.zeros(n), np.full(n, h))
    roll_rates = np.array([0.2, 0.0, -0.1, 0.05], np.float32)
    pitch_rates = np.array([0.0, 0.3, 0.1, -0.2], np.float32)
    tick = fleet.tick(
        frames, np.full(n, dt), np.full(n, h),
        roll_rates=roll_rates, pitch_rates=pitch_rates,
    ).materialize()
    assert tick.ok.all()

    p_lr = pipe.engine.num_windows_lr
    for i in range(n):
        exp = get_2dt(
            jnp.zeros((p_lr, 2), jnp.float32), jnp.float32(h),
            jnp.float32(dt), jnp.float32(pipe.ul_x),
            jnp.asarray(K, jnp.float32),
            jnp.float32(roll_rates[i]), jnp.float32(pitch_rates[i]),
            jnp.float32(np.pi / 2),
            long_range_ratio=pipe.engine.config.long_range_ratio,
        )
        np.testing.assert_allclose(
            tick.tran[i], np.asarray(exp.tran), atol=1e-4,
            err_msg=f"stream {i}",
        )
    # and the rates genuinely differ per stream (the map is not constant)
    assert np.std(tick.tran[:, 0]) > 1e-3 or np.std(tick.tran[:, 1]) > 1e-3
