"""Geometry fuzz: random (frame, patch, ratio) combinations through every
engine step — guards the normalization / alignment / fallback-path logic
(kernel gating on patch % 8, long-range patch clamping, odd sizes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

from oracle import smooth_random_image

# (frame, patch, ratio): aligned, unaligned, odd patch, non-divisor patch,
# tiny frames, downsample-smaller-than-patch
CASES = [
    (96, 24, 4),    # frames-kernel aligned
    (120, 60, 4),   # patch % 8 != 0 -> patch-batch fallback
    (90, 45, 2),    # odd-ish patch, ratio 2 policy
    (100, 33, 4),   # non-divisor -> whole-frame window after normalization
    (64, 64, 4),    # one window; LR window = 16 px
    (360, 120, 4),  # LR downsample (90) < patch (120)
    (97, 24, 4),    # odd config frame -> normalized() trims to 96 (the
                    # engine contract is config-sized input; raw odd-sized
                    # capture is cropped by the node's preprocess)
]


@pytest.mark.parametrize("frame,patch,ratio", CASES)
def test_engine_shapes(rng, frame, patch, ratio):
    eng = FftMethod(FftMethodConfig(
        frame_size=frame, sample_point_size=patch, long_range_ratio=ratio,
    ))
    c = eng.config
    f = c.frame_size
    prev = smooth_random_image(rng, f, cutoff=0.4)
    curr = np.roll(prev, (1, -2), axis=(0, 1))

    # stateful short-range
    state = eng.set_im_prev(eng.init_state(), jnp.asarray(prev))
    _, res = eng.step(state, jnp.asarray(curr))
    assert res.shifts.shape == (eng.num_windows, 2)
    med = np.nanmedian(np.asarray(res.shifts), axis=0)
    assert np.abs(med - [-2.0, 1.0]).max() < 0.75, (frame, patch, med)

    # batched short-range agrees
    bres = eng.step_batch(jnp.asarray(prev)[None], jnp.asarray(curr)[None])
    np.testing.assert_allclose(
        np.asarray(bres.shifts[0]), np.asarray(res.shifts), atol=1e-4,
        equal_nan=True,
    )

    # long-range paths produce the advertised coarse grid without crashing
    state = eng.set_im_prev(eng.init_state(), jnp.asarray(prev))
    _, lr = eng.step_long_range(state, jnp.asarray(curr))
    assert lr.shifts.shape == (eng.num_windows_lr, 2)
    blr = eng.step_batch_long_range(jnp.asarray(prev)[None], jnp.asarray(curr)[None])
    np.testing.assert_allclose(
        np.asarray(blr.shifts[0]), np.asarray(lr.shifts), atol=1e-4, equal_nan=True
    )
