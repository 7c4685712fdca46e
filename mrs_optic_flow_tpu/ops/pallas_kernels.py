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


def _masked_peak_centroid(
    v, n: int, search_radius: int, centroid_radius: int, transposed: bool = False
):
    """Shared kernel body: v is the raw (unshifted) [N, N] surface.

    Works entirely in index space: pre-shift index ``i`` corresponds to the
    fftshifted coordinate ``(i + N//2) % N``, so instead of rolling the data
    we roll the coordinates (free on the VPU).

    ``transposed=True`` treats ``v`` as the transposed surface (rows = x,
    cols = y) and returns the same ``(maxval, cx, cy)`` — including the
    reference's row-major tie order, reconstructed in index space.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # fftshifted coordinates of every element
    srow = (rows + n // 2) % n
    scol = (cols + n // 2) % n
    if transposed:
        srow, scol = scol, srow

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


def is_8bit(dtype) -> bool:
    """The one predicate behind all 8-bit fast paths: streaming frames into
    VMEM uncast, the in-kernel int32-routed cast, and the exact-in-bf16
    input split drop.  Extend here, nowhere else."""
    return jnp.dtype(dtype) in (jnp.uint8, jnp.int8)


def _kcast_f32(x):
    """In-kernel cast to float32.  Mosaic has no direct uint8->f32 lowering;
    8-bit data routes through int32 (exact)."""
    if is_8bit(x.dtype):
        x = x.astype(jnp.int32)
    return x.astype(jnp.float32)


def _canon_passes(bf16x3) -> int:
    """Canonicalize the MXU pass count BEFORE any jit boundary: ``True == 1``
    in Python (same hash), so a bool True leaking into a static jit arg
    would silently reuse the 1-pass compilation (and vice versa)."""
    return 3 if bf16x3 is True else int(bf16x3)


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
    src1_ref, src2_ref, *refs,
    n, q, search_radius, centroid_radius, bf16x3, half_spectrum,
    exact_inputs=False, band_stack=1,
):
    """Frame-banded variant: the grid is (batch, qy) and each step's
    BlockSpec carves a full row band ``[S, W]`` straight out of the frame —
    patch extraction happens as VMEM slices of the band, so the
    reshape/transpose patchify (two full-frame HBM copies per step)
    disappears.  (Mosaic requires lane-dim blocks of 128 or full width, so
    the tiling is per-band, not per-patch.)  Field order stays
    ``index = i + q*j`` (``src/FftMethod.cpp:417``)."""
    weight_refs, out_ref = refs[:-1], refs[-1]
    b = pl.program_id(0)
    jg = pl.program_id(1)
    m = src1_ref.shape[0]  # frame pairs per grid step
    g = src1_ref.shape[1] // n  # bands per pair per grid step
    if half_spectrum:
        bands1, bands2, row0s = [], [], []
        for mi in range(m):
            for jj in range(g):
                bands1.append(src1_ref[mi, jj * n : (jj + 1) * n])
                bands2.append(src2_ref[mi, jj * n : (jj + 1) * n])
                row0s.append(((b * m + mi) * q + jg * g + jj) * q)
        # band_stack bands share each matmul stream; smaller stacks leave
        # each group's VPU peak stage free to overlap the next group's MXU
        # work (measured: full-step stacking is ~10% slower than per-band)
        for k0 in range(0, len(bands1), band_stack):
            k1 = k0 + band_stack
            _pc_bands_body_half(
                bands1[k0:k1], bands2[k0:k1], *weight_refs,
                out_ref=out_ref, row0s=row0s[k0:k1], n=n, q=q,
                search_radius=search_radius,
                centroid_radius=centroid_radius, bf16x3=bf16x3,
                exact_inputs=exact_inputs,
            )
        return
    for mi in range(m):
        for jj in range(g):
            j = jg * g + jj
            band1 = src1_ref[mi, jj * n : (jj + 1) * n]  # [S, W]
            band2 = src2_ref[mi, jj * n : (jj + 1) * n]
            for i in range(q):
                row = ((b * m + mi) * q + j) * q + i
                _phase_correlate_body(
                    jax.lax.slice(band1, (0, i * n), (n, (i + 1) * n)),
                    jax.lax.slice(band2, (0, i * n), (n, (i + 1) * n)),
                    *weight_refs,
                    out_ref=out_ref, row=row, n=n, search_radius=search_radius,
                    centroid_radius=centroid_radius, bf16x3=bf16x3,
                )


def _weight_operands(n: int, bf16x3: bool, half_spectrum: bool):
    """DFT weight operands + their BlockSpecs (constant index maps).

    Always passes (hi, lo) per matrix so kernel signatures are static; in
    full-precision mode ``hi`` is the f32 matrix and ``lo`` goes unused.
    """
    if half_spectrum:
        mats = list(_dft_packed_half(n))
    else:
        mats = list(_dft_matrices(n))
    ops, specs = [], []
    for m in mats:
        hi, lo = _split_bf16(m)
        if not bf16x3:
            hi = m
        nd = len(m.shape)
        specs += [
            pl.BlockSpec(m.shape, (lambda *_: (0,) * nd), memory_space=pltpu.VMEM)
        ] * 2
        ops += [jnp.asarray(hi), jnp.asarray(lo)]
    return ops, specs


def phase_correlate_frames_pallas(
    curr_frames: jnp.ndarray,
    prev_frames: jnp.ndarray,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-frame batched phase correlation without patch extraction:
    ``[B, H, W]`` frame pairs -> ``(shift [B, q*q, 2], maxval [B, q*q])``.

    Keyword arguments (all static): ``patch`` (required), ``search_radius``,
    ``centroid_radius``, ``interpret``, ``bf16x3``, ``half_spectrum``,
    ``bands_per_step``, ``pairs_per_step``, ``band_stack``,
    ``exact_inputs`` — see :func:`_phase_correlate_frames_impl`.

    This thin wrapper canonicalizes ``bf16x3`` (``True``/``1`` collide in
    the jit static-arg cache: ``True == 1``) before the jit boundary.
    """
    if "bf16x3" in kwargs:
        kwargs["bf16x3"] = _canon_passes(kwargs["bf16x3"])
    return _phase_correlate_frames_impl(curr_frames, prev_frames, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch", "search_radius", "centroid_radius", "interpret", "bf16x3",
        "half_spectrum", "bands_per_step", "pairs_per_step", "band_stack",
        "exact_inputs",
    ),
)
def _phase_correlate_frames_impl(
    curr_frames: jnp.ndarray,
    prev_frames: jnp.ndarray,
    *,
    patch: int,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
    bf16x3: int = 3,
    half_spectrum: bool = True,
    bands_per_step: int | None = None,
    pairs_per_step: int | None = None,
    band_stack: int | None = None,
    exact_inputs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``bands_per_step``: row bands processed per grid step.  More bands per
    step batch more work into each matmul stream (the half-spectrum body
    M-stacks every band of the step; measured +10% at 4 vs 1 on 480x480/120
    v5e before the stacking, more after); default picks the largest divisor
    of the grid height whose two input blocks stay under a VMEM budget.
    ``pairs_per_step``: frame pairs per grid step — more per-step work,
    bounded by VMEM.  ``band_stack``: how many of the step's bands share
    each matmul stream (M-stacked).  Defaults (``None``) auto-select the
    measured-fastest pair: ``(2, 2)`` for even batches (+3.7% over
    ``(1, 1)`` at the 4096-frame bench point, 58.3k vs 56.2k fps on v5e;
    full sweep in scripts/tune_frames_kernel.py), ``(1, 1)`` for odd
    batches — which keeps the b=1 single-frame latency path at per-band
    streams, the fastest shape measured for one pair per step.
    ``bf16x3``: MXU passes per f32 matmul (0 = Precision.HIGHEST).
    """
    interpret = _auto_interpret(interpret)
    if interpret:
        bf16x3 = 0
    b, h, w = curr_frames.shape
    qy, qx = h // patch, w // patch
    if qy != qx:
        raise ValueError(f"expected a square patch grid, got {qy}x{qx}")
    q = qx
    n = patch
    if pairs_per_step is None:
        pairs_per_step = 2 if b % 2 == 0 else 1
    if band_stack is None:
        band_stack = 2 if pairs_per_step >= 2 else 1
    m = pairs_per_step
    if b % m:
        raise ValueError(f"pairs_per_step {m} must divide the batch {b}")
    g = bands_per_step
    if g is None:
        # the input blocks ride the DMA in their own dtype (1 byte for the
        # 8-bit streaming path, 4 for float32)
        itemsize = 1 if is_8bit(curr_frames.dtype) else 4
        g = q
        while g > 1 and (q % g or 2 * m * g * n * w * itemsize > 4 << 20):
            g -= 1
    if q % g:
        raise ValueError(f"bands_per_step {g} must divide the grid rows {q}")
    wops, wspecs = _weight_operands(n, bf16x3, half_spectrum)
    fspec = pl.BlockSpec(
        (m, g * n, w), lambda bb, j: (bb, j, 0), memory_space=pltpu.VMEM
    )
    rows = b * q * q
    logical_dots = 16 if half_spectrum else 18  # per patch (10.5 M-weighted)
    out = pl.pallas_call(
        functools.partial(
            _fullfused_frames_kernel, n=n, q=q, search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
            half_spectrum=half_spectrum, exact_inputs=exact_inputs,
            band_stack=band_stack,
        ),
        grid=(b // m, q // g),
        in_specs=[fspec, fspec] + wspecs,
        out_specs=pl.BlockSpec((rows, 4), lambda bb, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=logical_dots * 2 * n * n * n * rows,
            bytes_accessed=2 * 4 * n * n * rows,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        # 8-bit frames stream into VMEM as-is (4x less DMA and no f32
        # materialization pass in HBM); the cast to f32 happens on the VPU
        # inside the kernel body and is exact for 8-bit data
        curr_frames if is_8bit(curr_frames.dtype) else curr_frames.astype(jnp.float32),
        prev_frames if is_8bit(prev_frames.dtype) else prev_frames.astype(jnp.float32),
        *wops,
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


def _split_bf16(m):
    """hi/lo bfloat16 split of a float32 numpy matrix: m ~= hi + lo exactly
    to ~16 mantissa bits — the operand decomposition behind bf16x3 matmuls.
    (No annotation: numpy is imported function-locally, and a dangling
    ``np.ndarray`` annotation would NameError under get_type_hints.)"""
    import numpy as _np

    hi = _np.asarray(m, _np.float32).astype(jnp.bfloat16)
    lo = (_np.asarray(m, _np.float32) - _np.asarray(hi, _np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _pad8(k: int) -> int:
    """Round up to the TPU sublane granularity."""
    return (k + 7) // 8 * 8


@functools.lru_cache(maxsize=None)
def _dft_packed_half(n: int):
    """Packed half-spectrum DFT operands, laid out for tile-aligned slicing.

    All packing boundaries are MXU-friendly: stacked frequency blocks sit at
    ``p = pad8(n//2 + 1)`` sublane offsets, lane segments at 128 multiples —
    so every in-kernel slice has an aligned start and every matmul runs at a
    full (or near-full) M.

    - ``wh [2p, n]``: rows ``[C_half; S_half]`` — one left-multiply computes
      both forward row-stage products of a real patch.
    - ``cs [n, 2*seg]``: lanes ``[C | S]`` (segment stride ``seg``, a 128
      multiple) — one right-multiply computes ``x@C`` and ``x@S`` for a
      sublane-stacked complex pair.
    - ``w2 [n, 2p]``: lanes ``[C_half | -S_half]`` — the inverse fold
      ``v = C2@yr - S2@yi`` as ONE matmul with an exactly-128 contraction.
    """
    import numpy as _np

    from mrs_optic_flow_tpu.ops.phase_correlate import _dft_matrices as _dm

    c, s = _dm(n)
    nh = n // 2 + 1
    p = _pad8(nh)
    seg = (n + 127) // 128 * 128
    wh = _np.zeros((2 * p, n), _np.float32)
    wh[:nh] = c[:nh]
    wh[p : p + nh] = s[:nh]
    cs = _np.zeros((n, 2 * seg), _np.float32)
    cs[:, :n] = c
    cs[:, seg : seg + n] = s
    w2 = _np.zeros((n, 2 * p), _np.float32)
    w2[:, :nh] = c[:, :nh]
    w2[:, p : p + nh] = -s[:, :nh]
    w2t = _np.ascontiguousarray(w2.T)  # [2p, n] = [C_half; -S_half]
    return wh, cs, w2, w2t


def _mm_fns(bf16x3):
    """(weight @ x, x @ weight, weight @ exact_x) matmul helpers.

    ``bf16x3`` is the MXU pass count per f32 matmul (``True`` = 3):
    3 = hi@hi + lo@hi + hi@lo with f32 accumulation (~16-bit mantissa,
    0.0005 px flow error); 2 drops the data's low split (weights stay
    split); 1 is plain bf16 (~8-bit mantissa); ``False``/0 = one
    Precision.HIGHEST dot (six passes, full f32).  ``mm_wl_exact`` is for
    operands already exact in bfloat16 (uint8/int8 pixel data: 8-bit
    integers fit bf16's mantissa) — the data's low-order split vanishes, so
    it runs min(passes, 2)."""
    passes = _canon_passes(bf16x3)
    if passes:
        acc = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)

        def _split(x):
            xhi = x.astype(jnp.bfloat16)
            xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
            return xhi, xlo

        def mm_wl(whi, wlo, x):
            if passes == 1:
                return acc(whi, x.astype(jnp.bfloat16))
            xhi, xlo = _split(x)
            r = acc(whi, xhi) + acc(wlo, xhi)
            return r if passes == 2 else r + acc(whi, xlo)

        def mm_wr(x, whi, wlo):
            if passes == 1:
                return acc(x.astype(jnp.bfloat16), whi)
            xhi, xlo = _split(x)
            r = acc(xhi, whi) + acc(xhi, wlo)
            return r if passes == 2 else r + acc(xlo, whi)

        def mm_wl_exact(whi, wlo, x):
            xhi = x.astype(jnp.bfloat16)
            r = acc(whi, xhi)
            return r if passes == 1 else r + acc(wlo, xhi)

    else:
        hdot = functools.partial(jax.lax.dot, precision=jax.lax.Precision.HIGHEST)

        def mm_wl(whi, wlo, x):
            return hdot(whi, x)

        def mm_wr(x, whi, wlo):
            return hdot(x, whi)

        mm_wl_exact = mm_wl

    return mm_wl, mm_wr, mm_wl_exact


def _conj_fold_weights(n: int, p: int):
    """[p, n] row weights for folding the conjugate spectrum half back in:
    1 on the self-conjugate rows (0, and n/2 only when n is even — for odd
    n row n//2 pairs with row n//2+1 and needs weight 2), 2 on the other
    retained rows, 0 on the sublane padding."""
    nh = n // 2 + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    self_conj = rows == 0
    if n % 2 == 0:
        self_conj |= rows == n // 2
    return jnp.where(
        self_conj,
        1.0,
        jnp.where(rows < nh, 2.0, 0.0),
    ).astype(jnp.float32)


def _pc_bands_body_half(
    bands1, bands2, whh_ref, whl_ref, csh_ref, csl_ref, w2h_ref, w2l_ref,
    w2th_ref, w2tl_ref, *, out_ref, row0s, n, q, search_radius,
    centroid_radius, bf16x3, exact_inputs=False,
):
    """Band-batched half-spectrum body over ALL ``B = len(bands1)`` row bands
    of a grid step: every DFT stage runs as one matmul with the work stacked
    on the M (sublane) axis — across the ``q`` patches of each band AND
    across the bands.

    Same math and numerics as :func:`_phase_correlate_body_half` (stacking
    rows does not change any dot product).  At these small shapes the MXU is
    issue-bound, not MAC-bound, so fewer/longer streams win: per grid step
    the chain is ``2B`` forward matmuls + ``q`` x-DFT matmuls (patch column
    ``i``'s pieces share lane offset ``n*i`` across bands, so they stack;
    pieces of different columns can't — Mosaic concatenation needs matching
    lane offsets) + 1 cross-power matmul + 1 inverse fold — 16 instructions
    for a 4-band step vs 32 when each band ran alone.  The inverse fold runs
    transposed (``v^T = yq^T @ w2^T``) so its per-patch results also stack on
    M; the peak stage swaps coordinates back in index space
    (``transposed=True``).
    """
    nh = n // 2 + 1
    p = _pad8(nh)
    seg = (n + 127) // 128 * 128
    nb = len(bands1)
    mm_wl, mm_wr, mm_wl_exact = _mm_fns(bf16x3)
    mm_in = mm_wl_exact if exact_inputs else mm_wl
    whh, whl = whh_ref[...], whl_ref[...]
    csh, csl = csh_ref[...], csl_ref[...]
    w2th, w2tl = w2th_ref[...], w2tl_ref[...]

    # forward y-DFT of every patch of every band at once: each band's lane
    # axis already concatenates its patches
    us = [
        (
            mm_in(whh, whl, _kcast_f32(b1)),  # [2p, q*n] = [C@x; S@x]
            mm_in(whh, whl, _kcast_f32(b2)),
        )
        for b1, b2 in zip(bands1, bands2)
    ]

    d = _conj_fold_weights(n, p)
    gs = []
    for i in range(q):
        # every band's x-DFT for patch column i in one matmul (M = B*4p):
        # all pieces share lane offset n*i, so they concatenate on sublanes
        # without relayout
        def uc_us(u):
            uc = jax.lax.slice(u, (0, i * n), (p, (i + 1) * n))
            usl = jax.lax.slice(u, (p, i * n), (2 * p, (i + 1) * n))
            return uc, -usl  # [ur; ui] with ui = -S@x

        pieces = []
        for u1, u2 in us:
            u1c, u1s = uc_us(u1)
            u2c, u2s = uc_us(u2)
            pieces += [u1c, u1s, u2c, u2s]
        t = jax.lax.concatenate(pieces, 0)  # [B*4p, n]
        gs.append(mm_wr(t, csh, csl))  # [B*4p, 2seg]: all bands' {u@C, u@S}

    xq_parts = []
    for bi in range(nb):
        for i in range(q):
            g = gs[i]

            def g_at(base):
                gr = jax.lax.slice(g, (base, 0), (base + p, n)) + jax.lax.slice(
                    g, (base + p, seg), (base + 2 * p, seg + n)
                )
                gi = jax.lax.slice(g, (base + p, 0), (base + 2 * p, n)) - jax.lax.slice(
                    g, (base, seg), (base + p, seg + n)
                )
                return gr, gi

            f1r, f1i = g_at(bi * 4 * p)
            f2r, f2i = g_at(bi * 4 * p + 2 * p)
            rr = f1r * f2r + f1i * f2i
            ri = f1i * f2r - f1r * f2i
            denom = jax.lax.rsqrt(rr * rr + ri * ri + FLT_EPSILON)
            xq_parts += [d * rr * denom, d * ri * denom]
    # [B*q*2p, n], all offset-0 pieces, ordered (band, patch)
    xq = jax.lax.concatenate(xq_parts, 0)

    y = mm_wr(xq, csh, csl)  # [B*q*2p, 2seg]
    yt_parts = []
    for k in range(nb * q):
        base = k * 2 * p
        yr = jax.lax.slice(y, (base, 0), (base + p, n)) - jax.lax.slice(
            y, (base + p, seg), (base + 2 * p, seg + n)
        )
        yi = jax.lax.slice(y, (base, seg), (base + p, seg + n)) + jax.lax.slice(
            y, (base + p, 0), (base + 2 * p, n)
        )
        yt_parts.append(jnp.transpose(jax.lax.concatenate([yr, yi], 0)))
    yt = jax.lax.concatenate(yt_parts, 0)  # [B*q*n, 2p]
    vt = mm_wr(yt, w2th, w2tl)  # [B*q*n, n]: per-patch v^T, M-stacked

    inv = 1.0 / (n * n)
    for bi in range(nb):
        for i in range(q):
            k = bi * q + i
            v_t = jax.lax.slice(vt, (k * n, 0), ((k + 1) * n, n)) * inv
            maxval, cx, cy = _masked_peak_centroid(
                v_t, n, search_radius, centroid_radius, transposed=True
            )
            out_ref[pl.ds(row0s[bi] + i, 1), :] = _pack_row(maxval, cx, cy)


def _phase_correlate_body_half(
    src1, src2, whh_ref, whl_ref, csh_ref, csl_ref, w2h_ref, w2l_ref,
    w2th_ref, w2tl_ref, *, out_ref, row, n, search_radius, centroid_radius,
    bf16x3, exact_inputs=False,
):
    """Half-spectrum variant of :func:`_phase_correlate_body`: real-input
    DFTs are Hermitian (``F[-k,-l] = conj(F[k,l])``), so only ``n//2 + 1``
    frequency rows are ever computed, carried through the cross-power, and
    folded back in the inverse with per-row weights ``{1, 2, ..., 2, 1}``
    (the conjugate half contributes the complex conjugate of each term, and
    the final surface is real).

    Execution shape: the halved frequency dim rides the matmul *M* axis
    (sublanes, granularity 8) — the only MXU axis where 61-of-120 buys
    cycles; lanes and contractions pad to 128 regardless.  Real/imag (and
    C/S) pairs are packed into single tile-aligned operands
    (:func:`_dft_packed_half`), so the whole chain is 5 logical matmuls with
    M in {120, 128}: ~27 tile-passes vs 54 for the full-spectrum body, zero
    in-kernel transposes, and half the hi/lo split traffic.  Math identical
    to the full path (validated to 1e-15 in float64).
    """
    nh = n // 2 + 1
    p = _pad8(nh)
    seg = (n + 127) // 128 * 128
    mm_wl, mm_wr, mm_wl_exact = _mm_fns(bf16x3)
    mm_in = mm_wl_exact if exact_inputs else mm_wl
    whh, whl = whh_ref[...], whl_ref[...]
    csh, csl = csh_ref[...], csl_ref[...]
    w2h, w2l = w2h_ref[...], w2l_ref[...]

    def fwd_half(x):
        """Half spectrum of a real patch: [p, n] (rows = y-freq 0..n/2,
        cols = x-freq, full).  Two matmuls: ``[C;S] @ x`` then the
        sublane-stacked complex pair times ``[C | S]``."""
        u = mm_in(whh, whl, _kcast_f32(x))  # [2p, n] = [C@x; S@x]
        ur = jax.lax.slice(u, (0, 0), (p, n))
        ui = -jax.lax.slice(u, (p, 0), (2 * p, n))
        t = jax.lax.concatenate([ur, ui], 0)  # [2p, n]
        vv = mm_wr(t, csh, csl)  # [2p, 2seg] = [ur@C, ur@S; ui@C, ui@S]
        gr = jax.lax.slice(vv, (0, 0), (p, n)) + jax.lax.slice(
            vv, (p, seg), (2 * p, seg + n)
        )
        gi = jax.lax.slice(vv, (p, 0), (2 * p, n)) - jax.lax.slice(
            vv, (0, seg), (p, seg + n)
        )
        return gr, gi

    f1r, f1i = fwd_half(src1)
    f2r, f2i = fwd_half(src2)

    # cmulnormf on the half spectra (cl/FftMethod.cl:976-982) + the
    # conjugate-fold row weights: 1 for the self-conjugate rows (0 and n/2),
    # 2 for rows 1..n/2-1, 0 for the sublane padding
    rr = f1r * f2r + f1i * f2i
    ri = f1i * f2r - f1r * f2i
    denom = jax.lax.rsqrt(rr * rr + ri * ri + FLT_EPSILON)
    d = _conj_fold_weights(n, p)
    xr = d * rr * denom
    xi = d * ri * denom

    # inverse: v = Re[V_half^T (D R) V] / n^2 with V = conj(W) = C + iS
    xq = jax.lax.concatenate([xr, xi], 0)  # [2p, n]
    y = mm_wr(xq, csh, csl)  # [2p, 2seg] = [xr@C, xr@S; xi@C, xi@S]
    yr = jax.lax.slice(y, (0, 0), (p, n)) - jax.lax.slice(
        y, (p, seg), (2 * p, seg + n)
    )
    yi = jax.lax.slice(y, (0, seg), (p, seg + n)) + jax.lax.slice(
        y, (p, 0), (2 * p, n)
    )
    yq = jax.lax.concatenate([yr, yi], 0)  # [2p, n]
    v = mm_wl(w2h, w2l, yq) * (1.0 / (n * n))  # [n, n], K = 2p exactly

    maxval, cx, cy = _masked_peak_centroid(v, n, search_radius, centroid_radius)
    out_ref[pl.ds(row, 1), :] = _pack_row(maxval, cx, cy)


def _phase_correlate_body(
    src1, src2, chi_ref, clo_ref, shi_ref, slo_ref,
    *, out_ref, row, n, search_radius, centroid_radius, bf16x3,
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

    f1r, f1i = dft2_t(_kcast_f32(src1))
    f2r, f2i = dft2_t(_kcast_f32(src2))

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
    src1_ref, src2_ref, *refs,
    n, search_radius, centroid_radius, bf16x3, half_spectrum,
    exact_inputs=False,
):
    """Patch-batch variant: grid (P,), one patch per step."""
    weight_refs, out_ref = refs[:-1], refs[-1]
    if half_spectrum:
        _phase_correlate_body_half(
            src1_ref[0], src2_ref[0], *weight_refs,
            out_ref=out_ref, row=pl.program_id(0), n=n,
            search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
            exact_inputs=exact_inputs,
        )
        return
    _phase_correlate_body(
        src1_ref[0], src2_ref[0], *weight_refs,
        out_ref=out_ref, row=pl.program_id(0), n=n, search_radius=search_radius,
        centroid_radius=centroid_radius, bf16x3=bf16x3,
    )


def phase_correlate_fullfused_pallas(
    curr: jnp.ndarray,
    prev: jnp.ndarray,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-launch phase correlation: raw ``[P, N, N]`` patches ->
    ``(shift [P, 2], maxval [P])``, no HBM intermediates at all.

    Thin wrapper canonicalizing ``bf16x3`` before the jit boundary
    (``True == 1`` collides in the static-arg cache); see
    :func:`_phase_correlate_fullfused_impl` for the keyword arguments.
    """
    if "bf16x3" in kwargs:
        kwargs["bf16x3"] = _canon_passes(kwargs["bf16x3"])
    return _phase_correlate_fullfused_impl(curr, prev, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_radius", "centroid_radius", "interpret", "bf16x3",
        "half_spectrum", "exact_inputs",
    ),
)
def _phase_correlate_fullfused_impl(
    curr: jnp.ndarray,
    prev: jnp.ndarray,
    *,
    search_radius: int = 55,
    centroid_radius: int = 3,
    interpret: bool | None = None,
    bf16x3: int = 3,
    half_spectrum: bool = True,
    exact_inputs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    interpret = _auto_interpret(interpret)
    if interpret:
        # the interpreter has no MXU; bf16 splitting just adds noise there
        bf16x3 = 0
    p, n, _ = curr.shape
    wops, wspecs = _weight_operands(n, bf16x3, half_spectrum)
    spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    logical_dots = 16 if half_spectrum else 18
    out = pl.pallas_call(
        functools.partial(
            _fullfused_kernel, n=n, search_radius=search_radius,
            centroid_radius=centroid_radius, bf16x3=bf16x3,
            half_spectrum=half_spectrum, exact_inputs=exact_inputs,
        ),
        grid=(p,),
        in_specs=[spec, spec] + wspecs,
        out_specs=pl.BlockSpec((p, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=logical_dots * 2 * n * n * n * p, bytes_accessed=2 * 4 * n * n * p,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        curr.astype(jnp.float32), prev.astype(jnp.float32), *wops,
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
