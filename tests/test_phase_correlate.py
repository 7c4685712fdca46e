"""Conformance tests for the phase-correlation core.

Three axes of verification (SURVEY.md section 4):
1. recovery of known integer and sub-pixel shifts on synthetic textures,
2. golden-value conformance vs the NumPy oracle transcribing the reference
   kernel math (tests/oracle.py),
3. cross-check vs OpenCV's cv2.phaseCorrelate — the reference's own CPU
   fallback (src/FftMethod.cpp:1836 uses -cv::phaseCorrelate(curr, prev)).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mrs_optic_flow_tpu.ops.phase_correlate import (
    correlation_surface,
    peak_refine,
    phase_correlate_field,
)
from mrs_optic_flow_tpu.ops.preprocess import patchify

from oracle import fourier_shift, phase_correlate_oracle, smooth_random_image

BACKENDS = ["fft", "dft"]


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("shift", [(0, 0), (5, -3), (17, 9), (-30, 41), (55, -55)])
def test_integer_shift_recovery(rng, backend, shift):
    n = 120
    prev = smooth_random_image(rng, n)
    dx, dy = shift
    curr = np.roll(prev, (dy, dx), axis=(0, 1))
    out, maxval = phase_correlate_field(jnp.asarray(curr), jnp.asarray(prev), backend=backend)
    out = np.asarray(out)
    assert np.all(np.abs(out - np.array([dx, dy])) < 0.25), (out, shift)
    assert float(maxval) > 0.05


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("shift", [(2.5, -1.25), (-7.75, 3.5), (0.3, 0.7)])
def test_subpixel_shift_recovery(rng, backend, shift):
    n = 120
    prev = smooth_random_image(rng, n)
    dx, dy = shift
    curr = fourier_shift(prev, dx, dy).astype(np.float32)
    out, _ = phase_correlate_field(jnp.asarray(curr), jnp.asarray(prev), backend=backend)
    out = np.asarray(out)
    assert np.all(np.abs(out - np.array([dx, dy])) < 0.1), (out, shift)


@pytest.mark.parametrize("backend", BACKENDS)
def test_oracle_conformance(rng, backend):
    """Tight agreement with the reference-math oracle on random pairs.

    The fft backend matches to 0.01 px; the matmul-DFT backend accumulates
    float32 rounding across 18 [120,120] matmuls and is held to 0.05 px —
    both well inside the <0.1 px target of BASELINE.md.
    """
    atol = 0.01 if backend == "fft" else 0.05
    n = 120
    for k in range(5):
        prev = smooth_random_image(rng, n)
        curr = fourier_shift(prev, *rng.uniform(-40, 40, size=2)).astype(np.float32)
        curr += rng.normal(0, 2.0, curr.shape).astype(np.float32)
        ours, ours_max = phase_correlate_field(
            jnp.asarray(curr), jnp.asarray(prev), backend=backend
        )
        ref, ref_max = phase_correlate_oracle(curr, prev)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=atol)
        np.testing.assert_allclose(float(ours_max), ref_max, rtol=1e-3)


def test_opencv_cross_check(rng):
    """Matches -cv2.phaseCorrelate(curr, prev) within sub-pixel tolerance.

    OpenCV's sub-pixel estimator (5x5 centroid) differs from the reference's
    radius-3 positive-only centroid by up to ~0.4 px, so this only pins down
    the sign convention and the integer peak (tolerance 0.5 px); sub-pixel
    conformance is asserted against the oracle instead.
    """
    cv2 = pytest.importorskip("cv2")
    n = 120
    for _ in range(5):
        prev = smooth_random_image(rng, n).astype(np.float64)
        curr = fourier_shift(prev, *rng.uniform(-30, 30, size=2))
        (cvx, cvy), _resp = cv2.phaseCorrelate(curr, prev)
        ours, _ = phase_correlate_field(
            jnp.asarray(curr, dtype=jnp.float32), jnp.asarray(prev, dtype=jnp.float32)
        )
        ours = np.asarray(ours)
        assert abs(ours[0] - (-cvx)) < 0.5 and abs(ours[1] - (-cvy)) < 0.5


def test_search_radius_mask(rng):
    """Shifts beyond SEARCH_RADIUS are masked out of the surface entirely."""
    n = 120
    prev = smooth_random_image(rng, n)
    curr = np.roll(prev, (58, 0), axis=(0, 1))  # beyond radius 55
    surf = correlation_surface(jnp.asarray(curr), jnp.asarray(prev), search_radius=55)
    surf = np.asarray(surf)
    keep = np.abs(np.arange(n) - n // 2) <= 55
    assert np.all(surf[~keep, :] == 0.0)
    assert np.all(surf[:, ~keep] == 0.0)
    # the true peak was masked; the response collapses
    _, maxval = peak_refine(jnp.asarray(surf))
    assert float(maxval) < 0.5


def test_batched_grid(rng):
    """4x4 patch grid: each patch recovers its own shift; order matches the
    reference field-index convention index = i + q*j (src/FftMethod.cpp:417).
    """
    n, patch, q = 480, 120, 4
    prev = smooth_random_image(rng, n)
    shifts = rng.integers(-20, 20, size=(q * q, 2))
    curr = np.empty_like(prev)
    for j in range(q):
        for i in range(q):
            dx, dy = shifts[i + q * j]
            blk = prev[j * patch : (j + 1) * patch, i * patch : (i + 1) * patch]
            curr[j * patch : (j + 1) * patch, i * patch : (i + 1) * patch] = np.roll(
                blk, (dy, dx), axis=(0, 1)
            )
    curr_p = patchify(jnp.asarray(curr), patch)
    prev_p = patchify(jnp.asarray(prev), patch)
    out, _ = phase_correlate_field(curr_p, prev_p)
    out = np.asarray(out)
    assert out.shape == (q * q, 2)
    assert np.all(np.abs(out - shifts) < 0.3)


def test_nan_propagation():
    n = 120
    bad = jnp.full((n, n), jnp.nan, dtype=jnp.float32)
    out, _ = phase_correlate_field(bad, bad)
    assert np.all(np.isnan(np.asarray(out)))


@pytest.mark.parametrize("backend", BACKENDS)
def test_backend_equivalence(rng, backend):
    """fft and dft backends agree to float32 precision."""
    n = 120
    prev = smooth_random_image(rng, n)
    curr = fourier_shift(prev, 4.2, -11.7).astype(np.float32)
    a, _ = phase_correlate_field(jnp.asarray(curr), jnp.asarray(prev), backend="fft")
    b, _ = phase_correlate_field(jnp.asarray(curr), jnp.asarray(prev), backend="dft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_make_accuracy_pairs_shared_definition(rng):
    """The ONE pair-synthesis + oracle definition shared by the builder
    accuracy table (scripts/accuracy_report.py) and the driver artifact's
    on-chip accuracy stage (bench.py): known-shift uint8 pairs whose
    oracle answers track ground truth, and whose engine diff sits far
    under the 0.1 px conformance budget at any geometry."""
    from oracle import make_accuracy_pairs

    from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

    prev, curr, truth, osh = make_accuracy_pairs(
        rng, 2, size=96, patch=24, max_shift=5.0
    )
    assert prev.dtype == np.uint8 and curr.dtype == np.uint8
    assert prev.shape == (2, 96, 96) and osh.shape == (2, 16, 2)
    # the oracle recovers the known shifts (uint8 quantization + the
    # method's centroid bias bound the residual)
    assert np.median(np.abs(osh - truth[:, None, :])) < 0.5

    eng = FftMethod(FftMethodConfig(frame_size=96, sample_point_size=24))
    s = np.asarray(eng.step_batch(jnp.asarray(prev), jnp.asarray(curr)).shifts)
    # clean textured pairs inside every validity gate: zero NaN windows
    # (the property bench.py's accuracy stage newly asserts on-chip)
    assert not np.isnan(s).any()
    assert np.max(np.abs(s - osh)) < 0.1
