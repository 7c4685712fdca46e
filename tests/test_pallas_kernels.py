"""Pallas kernel conformance: must agree with the jnp path and the oracle.

On CPU the kernels run in interpret mode — the cross-backend equivalence
stands in for the reference's useOCL dual-path cross-check
(src/FftMethod.cpp:1824-1836, storageA/storageB diffing :1482-1483).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.ops.phase_correlate import (
    correlation_surface,
    peak_refine,
    phase_correlate_field,
)
from mrs_optic_flow_tpu.ops import pallas_kernels as pk

from oracle import fourier_shift, phase_correlate_oracle, smooth_random_image

INTERPRET = jax.default_backend() != "tpu"


def _random_pair_batch(rng, p=16, n=120):
    prev = np.stack([smooth_random_image(rng, n) for _ in range(p)])
    d = rng.uniform(-30, 30, size=(p, 2))
    curr = np.stack(
        [fourier_shift(prev[i], d[i, 0], d[i, 1]).astype(np.float32) for i in range(p)]
    )
    return jnp.asarray(curr), jnp.asarray(prev), d


def test_peak_refine_pallas_matches_jnp(rng):
    curr, prev, d = _random_pair_batch(rng, p=4)
    surf = correlation_surface(curr, prev)
    s_ref, m_ref = peak_refine(surf)
    s_pal, m_pal = pk.peak_refine_pallas(surf, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref), rtol=1e-5)
    assert np.all(np.abs(np.asarray(s_pal) - d) < 0.1)


def test_fused_pallas_matches_oracle(rng):
    curr, prev, d = _random_pair_batch(rng, p=4)
    s, m = pk.phase_correlate_fused_pallas(curr, prev, interpret=INTERPRET)
    s, m = np.asarray(s), np.asarray(m)
    assert np.all(np.abs(s - d) < 0.15)  # centroid bias vs truth; oracle parity is the tight gate
    for i in range(curr.shape[0]):
        ref, ref_max = phase_correlate_oracle(np.asarray(curr[i]), np.asarray(prev[i]))
        np.testing.assert_allclose(s[i], ref, atol=0.05)
        np.testing.assert_allclose(m[i], ref_max, rtol=1e-3)


def test_fused_pallas_via_field_api(rng):
    curr, prev, d = _random_pair_batch(rng, p=2)
    if INTERPRET:
        s, _ = pk.phase_correlate_fused_pallas(curr, prev, interpret=True)
    else:
        s, _ = phase_correlate_field(curr, prev, use_pallas=True)
    assert np.all(np.abs(np.asarray(s) - d) < 0.1)


def test_pallas_nan_propagation(rng):
    n = 120
    bad = jnp.full((2, n, n), jnp.nan, dtype=jnp.float32)
    s, _ = pk.phase_correlate_fused_pallas(bad, bad, interpret=INTERPRET)
    assert np.all(np.isnan(np.asarray(s)))


def test_pallas_masked_large_shift(rng):
    """A shift beyond SEARCH_RADIUS must not be reported as a valid peak."""
    n = 120
    prev = smooth_random_image(rng, n)
    curr = np.roll(prev, (0, 58), axis=(0, 1))
    s, m = pk.phase_correlate_fused_pallas(
        jnp.asarray(curr)[None], jnp.asarray(prev)[None], interpret=INTERPRET
    )
    assert float(m[0]) < 0.5  # true peak masked away


def test_cross_backend_conformance(rng):
    """All five backend paths agree within the guard band — the live
    version of the reference's storageA/storageB debug diff."""
    from mrs_optic_flow_tpu.ops import conformance

    curr, prev, _ = _random_pair_batch(rng, p=2)
    report = conformance.check(curr, prev, tolerance_px=0.05)
    assert len(report) == 10  # all pairs of 5 backends
    assert max(report.values()) < 0.05


def test_fullfused_pallas_matches_oracle(rng):
    """The zero-HBM-intermediate kernel (raw patches in, [P,4] out) holds
    the conformance budget in both precision modes."""
    curr, prev, d = _random_pair_batch(rng, p=4)
    for bf16x3 in [False, True]:
        s, m = pk.phase_correlate_fullfused_pallas(
            curr, prev, interpret=INTERPRET, bf16x3=bf16x3
        )
        s = np.asarray(s)
        assert np.all(np.abs(s - d) < 0.15)
        for i in range(curr.shape[0]):
            ref, _ = phase_correlate_oracle(np.asarray(curr[i]), np.asarray(prev[i]))
            np.testing.assert_allclose(s[i], ref, atol=0.05)


def test_frames_pallas_matches_patchified(rng):
    """Frame-tiled kernel (patch extraction in the index map) matches the
    patch-batch kernel and keeps the field order index = i + q*j."""
    from mrs_optic_flow_tpu.ops.preprocess import patchify

    b, n, q = 2, 120, 2
    prev = np.stack([smooth_random_image(rng, n * q) for _ in range(b)])
    d = rng.integers(-20, 20, size=(b, q * q, 2))
    curr = np.empty_like(prev)
    for bi in range(b):
        for j in range(q):
            for i in range(q):
                dx, dy = d[bi, i + q * j]
                blk = prev[bi, j * n:(j + 1) * n, i * n:(i + 1) * n]
                curr[bi, j * n:(j + 1) * n, i * n:(i + 1) * n] = np.roll(blk, (dy, dx), (0, 1))
    s_f, m_f = pk.phase_correlate_frames_pallas(
        jnp.asarray(curr), jnp.asarray(prev), patch=n, interpret=INTERPRET
    )
    s_p, m_p = pk.phase_correlate_fullfused_pallas(
        patchify(jnp.asarray(curr), n).reshape(-1, n, n),
        patchify(jnp.asarray(prev), n).reshape(-1, n, n),
        interpret=INTERPRET,
    )
    # the frames kernel runs the band-batched body (transposed inverse fold),
    # so association order differs slightly from the per-patch body
    np.testing.assert_allclose(np.asarray(s_f).reshape(-1, 2), np.asarray(s_p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_f).reshape(-1), np.asarray(m_p), rtol=1e-4)
    assert np.all(np.abs(np.asarray(s_f) - d) < 0.3)


def test_half_spectrum_matches_full(rng):
    """The Hermitian half-spectrum bodies are algebraically identical to the
    full-spectrum ones (conjugate-fold row weights {1,2,...,2,1})."""
    curr, prev, _ = _random_pair_batch(rng, p=4)
    s_h, m_h = pk.phase_correlate_fullfused_pallas(
        curr, prev, interpret=INTERPRET, half_spectrum=True
    )
    s_f, m_f = pk.phase_correlate_fullfused_pallas(
        curr, prev, interpret=INTERPRET, half_spectrum=False
    )
    np.testing.assert_allclose(np.asarray(s_h), np.asarray(s_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_h), np.asarray(m_f), rtol=1e-4)

    frames_c = jnp.asarray(np.concatenate([np.asarray(curr)] * 1).reshape(1, 2 * 120, 2 * 120))
    frames_p = jnp.asarray(np.asarray(prev).reshape(1, 2 * 120, 2 * 120))
    s_bh, _ = pk.phase_correlate_frames_pallas(
        frames_c, frames_p, patch=120, interpret=INTERPRET, half_spectrum=True
    )
    s_bf, _ = pk.phase_correlate_frames_pallas(
        frames_c, frames_p, patch=120, interpret=INTERPRET, half_spectrum=False
    )
    np.testing.assert_allclose(np.asarray(s_bh), np.asarray(s_bf), atol=1e-4)


def test_frames_bands_per_step_agree(rng):
    """Grouping multiple row bands into one grid step is layout-only."""
    b, n, q = 2, 24, 4
    prev = np.stack([smooth_random_image(rng, n * q) for _ in range(b)])
    curr = np.stack([np.roll(p, (3, -2), (0, 1)) for p in prev])
    outs = []
    for g in (1, 2, 4):
        s, m = pk.phase_correlate_frames_pallas(
            jnp.asarray(curr), jnp.asarray(prev), patch=n,
            interpret=INTERPRET, bands_per_step=g,
        )
        outs.append((np.asarray(s), np.asarray(m)))
    for s, m in outs[1:]:
        np.testing.assert_array_equal(s, outs[0][0])
        np.testing.assert_array_equal(m, outs[0][1])


def test_half_spectrum_odd_patch(rng):
    """Odd patch sizes: row n//2 of the half spectrum is NOT self-conjugate
    and must fold with weight 2 (regression: even-n weights silently broke
    odd-n surfaces)."""
    for n in (15, 45):
        prev = np.stack([smooth_random_image(rng, n) for _ in range(2)])
        curr = np.roll(prev, (1, 2), axis=(1, 2))
        s_h, _ = pk.phase_correlate_fullfused_pallas(
            jnp.asarray(curr), jnp.asarray(prev), search_radius=n // 2 - 4,
            interpret=INTERPRET, half_spectrum=True,
        )
        s_f, _ = pk.phase_correlate_fullfused_pallas(
            jnp.asarray(curr), jnp.asarray(prev), search_radius=n // 2 - 4,
            interpret=INTERPRET, half_spectrum=False,
        )
        np.testing.assert_allclose(np.asarray(s_h), np.asarray(s_f), atol=1e-3)


def test_engine_config_kernel_knobs(rng):
    """half_spectrum / bands_per_step are reachable from the engine config
    and produce equivalent flow.  patch % 8 == 0 so step_batch takes the
    frames kernel — the only consumer of bands_per_step."""
    from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

    prev = smooth_random_image(rng, 64)
    curr = np.roll(prev, 3, axis=1)
    outs = []
    for half in (True, False):
        eng = FftMethod(FftMethodConfig(
            frame_size=64, sample_point_size=16,
            half_spectrum=half, bands_per_step=2,
        ))
        res = eng.step_batch(jnp.asarray(prev)[None], jnp.asarray(curr)[None])
        outs.append(np.asarray(res.shifts))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)


def test_frames_pallas_masked_large_shift(rng):
    """SEARCH_RADIUS masking holds on the frame-banded (production) kernel,
    not just the patch-batch one."""
    n = 120
    prev = np.stack([smooth_random_image(rng, n)])
    curr = np.roll(prev, 58, axis=2)  # beyond the 55 px mask
    s, m = pk.phase_correlate_frames_pallas(
        jnp.asarray(curr), jnp.asarray(prev), patch=n, interpret=INTERPRET
    )
    assert float(m[0, 0]) < 0.5  # true peak masked away


def test_frames_pallas_uint8_direct_bit_identical(rng):
    """8-bit frames stream into the kernel without a float32 HBM copy; the
    in-kernel VPU cast must be bit-identical to pre-converted float32."""
    prev = (smooth_random_image(rng, 48) * 127 + 128).astype(np.uint8)[None]
    curr = np.roll(prev, (3, -2), axis=(1, 2))
    s8, m8 = pk.phase_correlate_frames_pallas(
        jnp.asarray(curr), jnp.asarray(prev), patch=12,
        interpret=INTERPRET, exact_inputs=True,
    )
    sf, mf = pk.phase_correlate_frames_pallas(
        jnp.asarray(curr, jnp.float32), jnp.asarray(prev, jnp.float32),
        patch=12, interpret=INTERPRET, exact_inputs=True,
    )
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(sf))
    np.testing.assert_array_equal(np.asarray(m8), np.asarray(mf))


@pytest.mark.slow
def test_frames_pallas_stacking_knobs_agree(rng):
    """band_stack / pairs_per_step regroup the matmul streams without
    changing any dot product — outputs must match the default exactly."""
    prev = np.stack([smooth_random_image(rng, 48) for _ in range(4)])
    curr = np.roll(prev, (0, 2, -3), axis=(0, 1, 2))
    ref, _ = pk.phase_correlate_frames_pallas(
        jnp.asarray(curr), jnp.asarray(prev), patch=12, interpret=INTERPRET
    )
    for m, stack in ((2, 1), (4, 2), (2, 3), (1, 4)):
        s, _ = pk.phase_correlate_frames_pallas(
            jnp.asarray(curr), jnp.asarray(prev), patch=12,
            interpret=INTERPRET, pairs_per_step=m, band_stack=stack,
        )
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref), atol=1e-5)


def test_mxu_passes_knob(rng):
    """Reduced-precision pass counts stay within the sub-pixel budget and
    are reachable from the engine config (frames-kernel path: patch % 8)."""
    from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

    prev = smooth_random_image(rng, 64)
    curr = np.roll(prev, (2, -1), axis=(0, 1))
    ref = None
    for passes in (False, True, 2, 1):
        eng = FftMethod(FftMethodConfig(
            frame_size=64, sample_point_size=16, mxu_passes=passes,
        ))
        res = eng.step_batch(jnp.asarray(prev)[None], jnp.asarray(curr)[None])
        s = np.asarray(res.shifts)
        if ref is None:
            ref = s
        # interpret mode runs full f32 regardless; on TPU the reduced modes
        # must stay well under the 0.1 px budget
        np.testing.assert_allclose(s, ref, atol=0.05)


def test_mxu_passes_true_one_no_cache_collision():
    """True == 1 in Python (same hash): a bool leaking into an
    equality-keyed cache (frozen-dataclass ==, jit static args) would make
    mxu_passes=True and =1 reuse each other's compilations.  Canonicalization
    must separate them everywhere before a jit boundary."""
    from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

    c_true = FftMethodConfig(mxu_passes=True).normalized()
    c_one = FftMethodConfig(mxu_passes=1).normalized()
    assert c_true.mxu_passes == 3 and type(c_true.mxu_passes) is int
    assert c_one.mxu_passes == 1
    assert c_true != c_one
    assert hash(FftMethod(c_true)) != hash(FftMethod(c_one))
    assert pk._canon_passes(True) == 3
    assert pk._canon_passes(False) == 0
    assert pk._canon_passes(2) == 2
