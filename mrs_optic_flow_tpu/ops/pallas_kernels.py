"""Pallas TPU kernels: the fused device core.

Re-design of the reference's single fused OpenCL kernel
``phaseCorrelateField`` (``cl/FftMethod.cl:1381-1485``).  The reference fuses
rowFFT -> colFFT -> conj-multiply-normalize -> icolFFT -> irowFFT(+fftshift
+mask) -> workgroup max reduction -> centroid refine into one kernel launch
per frame pair; these Pallas kernels realize the same fusion on TPU:

- :func:`peak_refine_pallas` — the ``minmaxloc`` + ``refine`` stages
  (``cl/FftMethod.cl:1164-1379``) fused with the fftshift and the
  SEARCH_RADIUS mask of ``ifft_multi_radix_rows`` (``cl/FftMethod.cl:737``,
  ``:826``).  Operates on the *raw* (unshifted) inverse-FFT output: the shift
  and mask are applied in index space, so the surface is never materialized
  twice in HBM.

- :func:`phase_correlate_fused_pallas` — the full post-forward-FFT chain in
  one launch: normalized cross-power (``cmulnormf``, ``cl/FftMethod.cl:976``)
  -> inverse 2-D DFT as in-kernel MXU matmuls -> masked peak -> centroid.
  One grid step per patch; all intermediates live in VMEM.

Both produce, per patch, ``(maxval, shift_x, shift_y)`` with the exact
reference semantics (min-flat-index ties, positive-only radius-3 centroid
with an epsilon-seeded denominator, result relative to ``N>>1``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrs_optic_flow_tpu.ops.phase_correlate import FLT_EPSILON, _dft_matrices


def _auto_interpret(interpret):
    """Pallas kernels compile only on TPU; elsewhere fall back to the
    interpreter so the CPU test harness exercises identical code."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _masked_peak_centroid(v, n: int, search_radius: int, centroid_radius: int):
    """Shared kernel body: v is the raw (unshifted) [N, N] surface.

    Works entirely in index space: pre-shift index ``i`` corresponds to the
    fftshifted coordinate ``(i + N//2) % N``, so instead of rolling the data
    we roll the coordinates (free on the VPU).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # fftshifted coordinates of every element
    srow = (rows + n // 2) % n
    scol = (cols + n // 2) % n

    # SEARCH_RADIUS mask (cl/FftMethod.cl:737, :826): keep |s - N//2| <= R
    keep = (jnp.abs(srow - n // 2) <= search_radius) & (
        jnp.abs(scol - n // 2) <= search_radius
    )
    v = jnp.where(keep, v, 0.0)

    # argmax with min-flat-index-in-shifted-space ties (cl:1250-1253 operates
    # on the shifted surface, so ties break on the shifted flat index)
    maxval = jnp.max(v)
    sflat = srow * n + scol
    loc = jnp.min(jnp.where(v == maxval, sflat, n * n))
    yc = loc // n
    xc = loc % n

    # positive-only weighted centroid over the radius window in shifted
    # coordinates (refine, cl/FftMethod.cl:1315-1379); window is contiguous
    # in shifted space because R + centroid_radius < N//2.
    in_win = (jnp.abs(srow - yc) <= centroid_radius) & (
        jnp.abs(scol - xc) <= centroid_radius
    )
    w = jnp.where(in_win & (v > 0.0), v, 0.0)
    denom = jnp.sum(w) + FLT_EPSILON
    cx = jnp.sum(w * scol.astype(v.dtype)) / denom - (n // 2)
    cy = jnp.sum(w * srow.astype(v.dtype)) / denom - (n // 2)

    nanv = jnp.float32(jnp.nan)
    bad = jnp.isnan(maxval)
    return maxval, jnp.where(bad, nanv, cx), jnp.where(bad, nanv, cy)


def _pack_row(maxval, cx, cy):
    """Pack three scalars into a (1, 4) float32 vector for a VMEM row store."""
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    row = jnp.where(cidx == 0, maxval, jnp.where(cidx == 1, cx, jnp.where(cidx == 2, cy, 0.0)))
    return row.astype(jnp.float32)


def _peak_kernel(surf_ref, out_ref, *, n, search_radius, centroid_radius):
    maxval, cx, cy = _masked_peak_centroid(
        surf_ref[0], n, search_radius, centroid_radius
    )
    # the [P, 4] result block stays VMEM-resident across the whole grid
    # (constant index map); each step fills its own row — the analogue of the
    # per-field result packing into the shared ML buffer
    # (cl/FftMethod.cl:1292-1300).  VMEM stores must be vectors, so the three
    # scalars are packed into one (1, 4) row.
    out_ref[pl.ds(pl.program_id(0), 1), :] = _pack_row(maxval, cx, cy)


@functools.partial(
    jax.jit, static_argnames=("search_radius", "centroid_radius", "interpret")
)
def peak_refine_raw_pallas(
    raw_surf: jnp.ndarray,
    *,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused fftshift+mask+argmax+centroid on a raw irfft2 output.

    ``raw_surf``: ``[P, N, N]`` *unshifted* inverse-FFT surfaces.  Returns
    ``(shift [P, 2], maxval [P])``.
    """
    interpret = _auto_interpret(interpret)
    p, n, _ = raw_surf.shape
    out = pl.pallas_call(
        functools.partial(
            _peak_kernel, n=n, search_radius=search_radius, centroid_radius=centroid_radius
        ),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
        interpret=interpret,
    )(raw_surf)
    return out[:, 1:3], out[:, 0]


def peak_refine_pallas(
    surf: jnp.ndarray,
    *,
    centroid_radius: int = 3,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas peak+centroid on an already fftshifted+masked surface.

    Drop-in replacement for :func:`...phase_correlate.peak_refine` (same
    contract); un-shifts in index space and reuses the raw kernel.  The
    surface is already masked, so the widest radius is passed through.
    """
    n = surf.shape[-1]
    batch = surf.shape[:-2]
    flat = surf.reshape((-1, n, n))
    # raw kernel expects unshifted data: ifftshift == fftshift for even N
    raw = jnp.fft.ifftshift(flat, axes=(-2, -1))
    shift, maxval = peak_refine_raw_pallas(
        raw, search_radius=n // 2, centroid_radius=centroid_radius, interpret=interpret
    )
    return shift.reshape(batch + (2,)), maxval.reshape(batch)


def _fullfused_frames_kernel(
    src1_ref, src2_ref, chi_ref, clo_ref, shi_ref, slo_ref, out_ref,
    *, n, q, search_radius, centroid_radius, bf16x3,
):
    """Frame-banded variant: the grid is (batch, qy) and each step's
    BlockSpec carves a full row band ``[S, W]`` straight out of the frame —
    patch extraction happens as VMEM slices of the band, so the
    reshape/transpose patchify (two full-frame HBM copies per step)
    disappears.  (Mosaic requires lane-dim blocks of 128 or full width, so
    the tiling is per-band, not per-patch.)  Field order stays
    ``index = i + q*j`` (``src/FftMethod.cpp:417``)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    band1 = src1_ref[0]  # [S, W]
    band2 = src2_ref[0]
    for i in range(q):
        row = (b * q + j) * q + i
        _phase_correlate_body(
            jax.lax.slice(band1, (0, i * n), (n, (i + 1) * n)),
            jax.lax.slice(band2, (0, i * n), (n, (i + 1) * n)),
            chi_ref, clo_ref, shi_ref, slo_ref,
            out_ref, row, n=n, search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
        )


@functools.partial(
    jax.jit,
    static_argnames=("patch", "search_radius", "centroid_radius", "interpret", "bf16x3"),
)
def phase_correlate_frames_pallas(
    curr_frames: jnp.ndarray,
    prev_frames: jnp.ndarray,
    *,
    patch: int,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
    bf16x3: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-frame batched phase correlation without patch extraction:
    ``[B, H, W]`` frame pairs -> ``(shift [B, q*q, 2], maxval [B, q*q])``."""
    interpret = _auto_interpret(interpret)
    if interpret:
        bf16x3 = False
    b, h, w = curr_frames.shape
    qy, qx = h // patch, w // patch
    if qy != qx:
        raise ValueError(f"expected a square patch grid, got {qy}x{qx}")
    q = qx
    n = patch
    c, s = _dft_matrices(n)
    chi, clo = _split_bf16(c)
    shi, slo = _split_bf16(s)
    if not bf16x3:
        chi, shi = jnp.asarray(c), jnp.asarray(s)
    fspec = pl.BlockSpec((1, n, w), lambda bb, j: (bb, j, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n, n), lambda bb, j: (0, 0), memory_space=pltpu.VMEM)
    rows = b * q * q
    out = pl.pallas_call(
        functools.partial(
            _fullfused_frames_kernel, n=n, q=q, search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
        ),
        grid=(b, q),
        in_specs=[fspec, fspec, wspec, wspec, wspec, wspec],
        out_specs=pl.BlockSpec((rows, 4), lambda bb, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=18 * 2 * n * n * n * rows, bytes_accessed=2 * 4 * n * n * rows,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        curr_frames.astype(jnp.float32), prev_frames.astype(jnp.float32),
        jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(shi), jnp.asarray(slo),
    )
    return out[:, 1:3].reshape(b, q * q, 2), out[:, 0].reshape(b, q * q)


# ---------------------------------------------------------------------------
# fully fused cross-power -> inverse DFT -> peak kernel
# ---------------------------------------------------------------------------


def _fused_kernel(
    f1r_ref, f1i_ref, f2r_ref, f2i_ref, c_ref, s_ref, out_ref,
    *, n, search_radius, centroid_radius,
):
    """Per-patch: cmulnormf -> inverse DFT (4+2 MXU matmuls) -> masked peak.

    The in-kernel matmul inverse transform is the TPU analogue of the
    ``ifft_multi_radix_cols/rows`` stages (``cl/FftMethod.cl:723-969``); the
    twiddle tables (``src/FftMethod.cpp:546-565``) become the DFT weight
    matrices ``C``/``S`` resident in VMEM.
    """
    f1r, f1i = f1r_ref[0], f1i_ref[0]
    f2r, f2i = f2r_ref[0], f2i_ref[0]
    c, s = c_ref[...], s_ref[...]

    # R = F1 * conj(F2), normalized (cmulnormf, cl/FftMethod.cl:976-982)
    rr = f1r * f2r + f1i * f2i
    ri = f1i * f2r - f1r * f2i
    denom = jax.lax.rsqrt(rr * rr + ri * ri + FLT_EPSILON)
    rr = rr * denom
    ri = ri * denom

    # r = Re( conj(W) @ R @ conj(W) ) / N^2, conj(W) = (C, -S)
    dot = functools.partial(jax.lax.dot, precision=jax.lax.Precision.HIGHEST)
    ur = dot(rr, c) + dot(ri, s)
    ui = dot(ri, c) - dot(rr, s)
    v = (dot(c, ur) + dot(s, ui)) * (1.0 / (n * n))

    maxval, cx, cy = _masked_peak_centroid(v, n, search_radius, centroid_radius)
    out_ref[pl.ds(pl.program_id(0), 1), :] = _pack_row(maxval, cx, cy)


def _split_bf16(m: np.ndarray):
    """hi/lo bfloat16 split of a float32 matrix: m ~= hi + lo exactly to
    ~16 mantissa bits — the operand decomposition behind bf16x3 matmuls."""
    import numpy as _np

    hi = _np.asarray(m, _np.float32).astype(jnp.bfloat16)
    lo = (_np.asarray(m, _np.float32) - _np.asarray(hi, _np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _phase_correlate_body(
    src1, src2, chi_ref, clo_ref, shi_ref, slo_ref, out_ref, row,
    *, n, search_radius, centroid_radius, bf16x3,
):
    """Shared per-patch computation: forward DFTs (12 MXU dots), cmulnormf,
    inverse DFT (6 dots), masked peak + centroid; result into row ``row``.

    This is the complete ``phaseCorrelateField`` chain
    (``cl/FftMethod.cl:1381-1485``) in VMEM: the only HBM traffic is the two
    input patches and a ``[1, 4]`` result row — the XLA-graph version
    materializes ~15 patch-sized intermediates in HBM and is bandwidth-bound
    at large batch.

    ``bf16x3=True`` runs each f32 matmul as three bf16 MXU passes
    (hi@whi + hi@wlo + lo@whi with f32 accumulation): ~1.6x faster than
    Precision.HIGHEST (six passes) at ~0.012 px flow error (budget: 0.1 px).
    """
    if bf16x3:
        chi, clo = chi_ref[...], clo_ref[...]
        shi, slo = shi_ref[...], slo_ref[...]
        acc = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)

        def dot_pair(x):
            """x @ C and x @ S with one shared hi/lo split of x."""
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            xc = acc(xhi, chi) + acc(xhi, clo) + acc(xlo, chi)
            xs = acc(xhi, shi) + acc(xhi, slo) + acc(xlo, shi)
            return xc, xs

        def dot_c_only(x):
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            return acc(xhi, chi) + acc(xhi, clo) + acc(xlo, chi)

        def dot_s_only(x):
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            return acc(xhi, shi) + acc(xhi, slo) + acc(xlo, shi)

    else:
        c, s = chi_ref[...], shi_ref[...]
        hdot = functools.partial(jax.lax.dot, precision=jax.lax.Precision.HIGHEST)

        def dot_pair(x):
            return hdot(x, c), hdot(x, s)

        def dot_c_only(x):
            return hdot(x, c)

        def dot_s_only(x):
            return hdot(x, s)

    # Everything runs as RIGHT multiplies in alternating orientation (the
    # left multiply ``W @ X`` is ``(X^T @ W)^T`` and W is symmetric), so a
    # 2-D DFT needs ONE transpose instead of one per left-product; the
    # cross-power is elementwise and orientation-agnostic, so the spectra
    # simply stay transposed until the inverse transform flips them back.

    def dft2_t(x):
        """Forward 2-D DFT, returning the TRANSPOSED spectrum."""
        tr, ti = dot_pair(x)
        rc, rs = dot_pair(jnp.swapaxes(tr, 0, 1))
        ic, is_ = dot_pair(jnp.swapaxes(ti, 0, 1))
        return rc - is_, ic + rs

    f1r, f1i = dft2_t(src1.astype(jnp.float32))
    f2r, f2i = dft2_t(src2.astype(jnp.float32))

    # cmulnormf on the transposed spectra (cl/FftMethod.cl:976-982)
    rr = f1r * f2r + f1i * f2i
    ri = f1i * f2r - f1r * f2i
    denom = jax.lax.rsqrt(rr * rr + ri * ri + FLT_EPSILON)
    rr = rr * denom
    ri = ri * denom

    # r = V R V with V = conj(W) = C - iS:  P = R^T V, then v = P^T V —
    # the middle transpose restores the natural orientation for the peak.
    rr_c, rr_s = dot_pair(rr)
    ri_c, ri_s = dot_pair(ri)
    pr = rr_c + ri_s
    pi = ri_c - rr_s
    v = (
        dot_c_only(jnp.swapaxes(pr, 0, 1)) + dot_s_only(jnp.swapaxes(pi, 0, 1))
    ) * (1.0 / (n * n))

    maxval, cx, cy = _masked_peak_centroid(v, n, search_radius, centroid_radius)
    out_ref[pl.ds(row, 1), :] = _pack_row(maxval, cx, cy)


def _fullfused_kernel(
    src1_ref, src2_ref, chi_ref, clo_ref, shi_ref, slo_ref, out_ref,
    *, n, search_radius, centroid_radius, bf16x3,
):
    """Patch-batch variant: grid (P,), one patch per step."""
    _phase_correlate_body(
        src1_ref[0], src2_ref[0], chi_ref, clo_ref, shi_ref, slo_ref,
        out_ref, pl.program_id(0), n=n, search_radius=search_radius,
        centroid_radius=centroid_radius, bf16x3=bf16x3,
    )


@functools.partial(
    jax.jit,
    static_argnames=("search_radius", "centroid_radius", "interpret", "bf16x3"),
)
def phase_correlate_fullfused_pallas(
    curr: jnp.ndarray,
    prev: jnp.ndarray,
    *,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
    bf16x3: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-launch phase correlation: raw ``[P, N, N]`` patches ->
    ``(shift [P, 2], maxval [P])``, no HBM intermediates at all."""
    interpret = _auto_interpret(interpret)
    if interpret:
        # the interpreter has no MXU; bf16 splitting just adds noise there
        bf16x3 = False
    p, n, _ = curr.shape
    c, s = _dft_matrices(n)
    chi, clo = _split_bf16(c)
    shi, slo = _split_bf16(s)
    if not bf16x3:
        chi, shi = jnp.asarray(c), jnp.asarray(s)  # full-precision weights
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fullfused_kernel, n=n, search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
        ),
        grid=(p,),
        in_specs=[spec, spec, wspec, wspec, wspec, wspec],
        out_specs=pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=18 * 2 * n * n * n * p, bytes_accessed=2 * 4 * n * n * p,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        curr.astype(jnp.float32), prev.astype(jnp.float32),
        jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(shi), jnp.asarray(slo),
    )
    return out[:, 1:3], out[:, 0]


@functools.partial(
    jax.jit, static_argnames=("search_radius", "centroid_radius", "interpret")
)
def phase_correlate_fused_pallas(
    curr: jnp.ndarray,
    prev: jnp.ndarray,
    *,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-launch phase correlation over a ``[P, N, N]`` patch batch.

    Forward transforms run as XLA batched matmul-DFTs (they saturate the MXU
    already); everything after — cross-power normalize, inverse transform,
    mask, peak, centroid — is a single Pallas kernel, one grid step per
    patch.  This mirrors the reference's one-enqueue-per-frame-pair design
    (``src/FftMethod.cpp:398``) with the readback reduced to ``[P, 4]``.

    Returns ``(shift [P, 2], maxval [P])`` in float32.
    """
    from mrs_optic_flow_tpu.ops.phase_correlate import _dft2_real

    interpret = _auto_interpret(interpret)
    p, n, _ = curr.shape
    f1r, f1i = _dft2_real(curr.astype(jnp.float32))
    f2r, f2i = _dft2_real(prev.astype(jnp.float32))
    c, s = (jnp.asarray(m) for m in _dft_matrices(n))

    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, n=n, search_radius=search_radius, centroid_radius=centroid_radius
        ),
        grid=(p,),
        in_specs=[spec, spec, spec, spec, wspec, wspec],
        out_specs=pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * n * n * n * p, bytes_accessed=4 * 4 * n * n * p, transcendentals=0
        ),
        interpret=interpret,
    )(f1r, f1i, f2r, f2i, c, s)
    return out[:, 1:3], out[:, 0]
