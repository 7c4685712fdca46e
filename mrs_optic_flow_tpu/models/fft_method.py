"""FftMethod — the live flow engine (method 4 of the reference).

Rebuild of ``FftMethod`` (``src/FftMethod.cpp:1680-2007``,
``include/FftMethod.h``): a grid of ``sqNum x sqNum`` phase correlations per
frame pair, with validity gating, plus the 4x-downsampled long-range variant.

What changed going TPU-native:

- the ctor's device-buffer zoo (usrc/FFT/FFTR/MUL/IFFTC/PCR/ML...,
  ``src/FftMethod.cpp:1723-1758``) disappears — XLA owns intermediate
  buffers inside the jitted program;
- the plan cache keyed by (size, depth) (``OCL_FftPlanCache``,
  ``include/FftMethod.h:284-317``) becomes the jit cache keyed by shape;
- the `useOCL` CPU/GPU switch (``src/FftMethod.cpp:1824-1836``) becomes
  `use_pallas` (fused Pallas kernel vs plain XLA) — both on-device, both
  bit-identical in tests;
- the per-frame blocking enqueue + host readback decode loop
  (``src/FftMethod.cpp:398-472``) becomes one device program returning a
  ``[P, 2]`` array; a batched ``step_batch`` amortizes dispatch for
  throughput mode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.models.base import FlowEngine, FlowResult, FlowState
from mrs_optic_flow_tpu.ops.phase_correlate import (
    DEFAULT_CENTROID_RADIUS,
    DEFAULT_SEARCH_RADIUS,
    correlation_surface,
    peak_refine,
)
from mrs_optic_flow_tpu.ops.preprocess import patchify, resize_by


@dataclasses.dataclass(frozen=True)
class FftMethodConfig:
    """Static engine parameters (the FftMethod ctor args,
    ``src/FftMethod.cpp:1680-1684``)."""

    frame_size: int = 480  # config/default.yaml:32
    sample_point_size: int = 120  # config/default.yaml:33
    max_pixel_speed: float = 80.0  # config/default.yaml:63
    search_radius: int = DEFAULT_SEARCH_RADIUS  # src/FftMethod.cpp:819-822
    centroid_radius: int = DEFAULT_CENTROID_RADIUS  # cl/FftMethod.cl:1478
    long_range_ratio: int = 4  # LONG_RANGE_RATIO, src/FftMethod.cpp:3
    backend: str = "dft"  # 'dft' (MXU matmul) or 'fft' (XLA FFT)
    use_pallas: bool = True  # useOCL analogue (src/optic_flow.cpp:853)
    #: Hermitian half-spectrum kernel bodies (docs/PERFORMANCE.md); False
    #: restores the full-spectrum path for parity/debugging
    half_spectrum: bool = True
    #: row bands per Pallas grid step for the frames kernel; None auto-picks
    bands_per_step: int | None = None
    #: frame pairs per Pallas grid step / bands sharing each M-stacked matmul
    #: stream; None auto-picks the measured-fastest pair per batch parity
    #: ((2, 2) even, (1, 1) odd/b=1 — docs/PERFORMANCE.md)
    pairs_per_step: int | None = None
    band_stack: int | None = None
    #: MXU passes per f32 matmul in the Pallas kernels: True/3 = bf16x3
    #: (0.0005 px error), 1 trades ~0.02 px for ~+37% throughput at deep
    #: pipelining (2 sits between), False = Precision.HIGHEST
    #: (measured numbers: docs/PERFORMANCE.md)
    mxu_passes: bool | int = True
    #: carry ``imPrev`` as 8-bit grayscale like the reference (the node's
    #: cvtColor produces CV_8UC1 and FftMethod swaps that into imPrev,
    #: ``src/optic_flow.cpp:1597``, ``src/FftMethod.cpp:1872``; the float
    #: conversion at ``:1805`` happens per step, from the 8-bit image).
    #: Incoming float grays are rounded to uint8 before use, which matches
    #: the reference's quantization, makes both operands 8-bit-exact so the
    #: frames kernel drops the low-order input split pass (2 MXU passes
    #: instead of 3 in stage 1), and quarters the carried state bytes.
    #: ``False`` keeps round 1's float32 carry (no input rounding).
    quantize_8bit: bool = True

    def normalized(self) -> "FftMethodConfig":
        """Derived-size normalization from the reference ctor:
        even frame size (``src/FftMethod.cpp:1707-1709``), frame forced to a
        multiple of the patch else one window (``:1710-1716``).  Also
        canonicalizes ``mxu_passes`` to an int: ``True == 1`` in Python, so
        a bool would collide with the 1-pass mode in every equality-keyed
        cache (frozen-dataclass ==, jit static args)."""
        if self.backend not in ("dft", "fft"):
            # fail at construction, not at the first traced step (the config
            # layer's strict-load philosophy, src/optic_flow.cpp:1084-1087)
            raise ValueError(
                f"unknown backend {self.backend!r} (expected 'fft' or 'dft')"
            )
        frame = self.frame_size - (self.frame_size % 2)
        patch = self.sample_point_size
        if frame % patch != 0:
            patch = frame
        passes = 3 if self.mxu_passes is True else int(self.mxu_passes)
        if (
            frame == self.frame_size
            and patch == self.sample_point_size
            and type(self.mxu_passes) is int
            and self.mxu_passes == passes
        ):
            return self
        return dataclasses.replace(
            self, frame_size=frame, sample_point_size=patch, mxu_passes=passes
        )


def _exact_in_bf16(frames: jnp.ndarray) -> bool:
    """True when the raw frame dtype is exactly representable in bfloat16
    (uint8/int8 camera pixels: 8-bit ints fit bf16's mantissa) — lets the
    kernels drop the low-order input split pass.  Shares the predicate with
    the kernels' streaming/cast paths so they can't desynchronize."""
    from mrs_optic_flow_tpu.ops.pallas_kernels import is_8bit

    return is_8bit(frames.dtype)


class FftMethod(FlowEngine):
    """Multi-patch FFT phase-correlation engine."""

    def __init__(self, config: FftMethodConfig = FftMethodConfig()):
        self.config = config.normalized()
        c = self.config
        #: grid side (sqNum = frameSize / samplePointSize, src/FftMethod.cpp:1719)
        self.sq_num = c.frame_size // c.sample_point_size
        #: long-range grid side (sqNum_lr = sqNum / LONG_RANGE_RATIO, :1720);
        #: the long-range patch size equals the normal one (:1685) — unless
        #: the downsampled frame is smaller than the patch (e.g. frame 360 /
        #: patch 120 / ratio 4 -> 90 px), where the whole downsampled frame
        #: becomes the single window (the reference's sqNum_lr would be 0
        #: there and its node-side bookkeeping indexes out of bounds;
        #: ARCHITECTURE.md deviation 5)
        self.patch_lr = min(c.sample_point_size, c.frame_size // c.long_range_ratio)
        self.sq_num_lr = max(
            (c.frame_size // c.long_range_ratio) // self.patch_lr, 1
        )
        self.num_windows = self.sq_num * self.sq_num
        self.num_windows_lr = self.sq_num_lr * self.sq_num_lr

    # -- state ---------------------------------------------------------------

    def init_state(self) -> FlowState:
        c = self.config
        dt = jnp.uint8 if c.quantize_8bit else jnp.float32
        return FlowState(
            prev=jnp.zeros((c.frame_size, c.frame_size), dt),
            first=jnp.asarray(True),
        )

    def _ingest(self, frame: jnp.ndarray) -> jnp.ndarray:
        """Frame as carried: rounded uint8 when ``quantize_8bit`` (the
        reference's 8-bit pipeline; pass-through for already-8-bit input),
        float32 otherwise."""
        if not self.config.quantize_8bit:
            return jnp.asarray(frame, jnp.float32)
        from mrs_optic_flow_tpu.ops.preprocess import quantize_u8

        return quantize_u8(frame)

    def set_im_prev(self, state: FlowState, frame: jnp.ndarray) -> FlowState:
        """``OpticFlowCalc::setImPrev`` with the engine's carry dtype."""
        return FlowState(prev=self._ingest(frame), first=jnp.asarray(False))

    # -- core ----------------------------------------------------------------

    def _correlate(self, curr_p: jnp.ndarray, prev_p: jnp.ndarray,
                   exact: bool = False):
        """Patch batch -> (shifts, response), backend-selected.

        ``exact``: the operands are 8-bit-exact in bfloat16 (uint8 patches)
        — the fullfused kernel then drops the low-order input split pass
        (same fast path as the frames kernel's ``exact_inputs``)."""
        c = self.config
        if c.use_pallas and c.backend == "dft":
            from mrs_optic_flow_tpu.ops.pallas_kernels import (
                phase_correlate_fullfused_pallas,
            )

            lead = curr_p.shape[:-3]
            flat_c = curr_p.reshape((-1,) + curr_p.shape[-2:])
            flat_p = prev_p.reshape((-1,) + prev_p.shape[-2:])
            s, m = phase_correlate_fullfused_pallas(
                flat_c,
                flat_p,
                search_radius=c.search_radius,
                centroid_radius=c.centroid_radius,
                half_spectrum=c.half_spectrum,
                bf16x3=c.mxu_passes,
                exact_inputs=exact,
            )
            return s.reshape(lead + curr_p.shape[-3:-2] + (2,)), m.reshape(
                lead + curr_p.shape[-3:-2]
            )
        surf = correlation_surface(
            curr_p.astype(jnp.float32), prev_p.astype(jnp.float32),
            search_radius=c.search_radius, backend=c.backend
        )
        if c.use_pallas:
            from mrs_optic_flow_tpu.ops.pallas_kernels import peak_refine_pallas

            return peak_refine_pallas(surf, centroid_radius=c.centroid_radius)
        return peak_refine(surf, centroid_radius=c.centroid_radius)

    def _lr_correlate(self, curr_d: jnp.ndarray, prev_d: jnp.ndarray):
        """Downsampled frame(s) ``[(B,) h, w]`` -> raw LR shifts/response.

        Shared by :meth:`step_long_range` and
        :meth:`step_batch_long_range`: TRIMS to the ``sq_num_lr * patch_lr``
        window grid first (top-left aligned, matching the reference's
        Rect-based window placement, ``src/FftMethod.cpp:1945-1957``) so
        geometries where the downsampled frame is not an exact multiple of
        the LR patch — which the reference accepts, e.g. frame 600 / patch
        120 / ratio 4 -> a 150 px image with one 120 px window — no longer
        crash ``patchify``'s reshape; then routes through the frame-banded
        Pallas kernel whenever the (trimmed) geometry qualifies, for the
        single-frame lane as well as the batch."""
        c = self.config
        patch = self.patch_lr
        m = self.sq_num_lr * patch
        curr_d = curr_d[..., :m, :m]
        prev_d = prev_d[..., :m, :m]
        batched = curr_d.ndim == 3
        if c.use_pallas and c.backend == "dft" and patch % 8 == 0:
            from mrs_optic_flow_tpu.ops.pallas_kernels import (
                phase_correlate_frames_pallas,
            )

            # honor the tuned banding where it fits the coarser grid;
            # fall back to auto-pick when it doesn't divide the LR rows
            g = c.bands_per_step
            if g is not None and self.sq_num_lr % g:
                g = None
            cb = curr_d if batched else curr_d[None]
            pb = prev_d if batched else prev_d[None]
            raw, resp = phase_correlate_frames_pallas(
                cb, pb,
                patch=patch,
                search_radius=c.search_radius,
                centroid_radius=c.centroid_radius,
                half_spectrum=c.half_spectrum,
                bands_per_step=g,
                pairs_per_step=(
                    c.pairs_per_step
                    if batched and c.pairs_per_step
                    and cb.shape[0] % c.pairs_per_step == 0
                    else None
                ),
                band_stack=c.band_stack,
                bf16x3=c.mxu_passes,
            )
            return (raw, resp) if batched else (raw[0], resp[0])
        return self._correlate(patchify(curr_d, patch), patchify(prev_d, patch))

    def _gate(self, shifts: jnp.ndarray, patch: int, max_speed: float) -> jnp.ndarray:
        """Validity gating -> NaN poisoning (``src/FftMethod.cpp:1840-1854``):
        reject ``|s|^2 > max_px^2``, ``|sx| > S/2``, ``|sy| > S/2``, NaN."""
        sx, sy = shifts[..., 0], shifts[..., 1]
        ok = (sx * sx + sy * sy) <= max_speed * max_speed
        ok &= jnp.abs(sx) <= patch / 2.0
        ok &= jnp.abs(sy) <= patch / 2.0
        ok &= jnp.isfinite(sx) & jnp.isfinite(sy)
        return jnp.where(ok[..., None], shifts, jnp.nan)

    # -- public steps ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def step(self, state: FlowState, frame: jnp.ndarray) -> Tuple[FlowState, FlowResult]:
        """``FftMethod::processImage`` (``src/FftMethod.cpp:1772-1903``).

        ``frame``: grayscale ``[H, W]`` (uint8 or float); conversion to
        float32 happens on device (``convertTo(CV_32FC1)``, ``:1805``).
        """
        c = self.config
        # with quantize_8bit both operands are 8-bit-exact (the reference's
        # 8U pipeline), so the frames kernel takes the exact-input fast path;
        # the float32 carry keeps round 1's behavior (no exact_inputs: a
        # mixed-dtype stream may leave non-integer values in state.prev)
        curr = self._ingest(frame)
        prev = jnp.where(state.first, curr, state.prev)  # first-frame copy (:1788)

        # the frame-banded kernel needs sublane-aligned bands (patch % 8);
        # other geometries take the patch-batch kernel via _correlate
        if c.use_pallas and c.backend == "dft" and c.sample_point_size % 8 == 0:
            from mrs_optic_flow_tpu.ops.pallas_kernels import (
                phase_correlate_frames_pallas,
            )

            raw, resp = phase_correlate_frames_pallas(
                curr[None], prev[None],
                patch=c.sample_point_size,
                search_radius=c.search_radius,
                centroid_radius=c.centroid_radius,
                half_spectrum=c.half_spectrum,
                bands_per_step=c.bands_per_step,
                # single-frame batch (b=1): pairs_per_step stays auto (1);
                # a configured value only applies to the batch modes
                band_stack=c.band_stack,
                bf16x3=c.mxu_passes,
                exact_inputs=c.quantize_8bit,
            )
            raw, resp = raw[0], resp[0]
        else:
            # patches keep the carry dtype: the fullfused kernel casts in
            # VMEM and 8-bit-exact operands drop the low-order split pass
            # (the non-pallas path casts to f32 inside _correlate)
            curr_p = patchify(curr, c.sample_point_size)
            prev_p = patchify(prev, c.sample_point_size)
            raw, resp = self._correlate(
                curr_p, prev_p,
                exact=_exact_in_bf16(curr) and _exact_in_bf16(prev),
            )
        shifts = self._gate(raw, c.sample_point_size, c.max_pixel_speed)

        new_state = FlowState(prev=curr, first=jnp.asarray(False))  # imPrev swap (:1872)
        return new_state, FlowResult(shifts=shifts, shifts_raw=raw, response=resp)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_long_range(
        self, state: FlowState, frame: jnp.ndarray
    ) -> Tuple[FlowState, FlowResult]:
        """``processImageLongRange`` (``src/FftMethod.cpp:1905-2007``):
        both frames downsampled by LONG_RANGE_RATIO (``:1931-1932``), coarser
        ``sq_num_lr`` grid at the same patch size, same gating with the
        long-range bounds (``max_px_speed_lr = max_px_speed``, ``:1687``).
        """
        c = self.config
        curr = self._ingest(frame)
        prev = jnp.where(state.first, curr, state.prev)

        # bilinear resize in float32 on the (possibly 8-bit) carry; the
        # reference resizes the 8U images and keeps 8U output (:1931-1932) —
        # a <=0.5 LSB rounding deviation on the downsampled pixels
        curr_d = resize_by(curr.astype(jnp.float32), c.long_range_ratio)
        prev_d = resize_by(prev.astype(jnp.float32), c.long_range_ratio)
        raw, resp = self._lr_correlate(curr_d, prev_d)
        shifts = self._gate(raw, self.patch_lr, c.max_pixel_speed)

        new_state = FlowState(prev=curr, first=jnp.asarray(False))
        return new_state, FlowResult(shifts=shifts, shifts_raw=raw, response=resp)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_batch(self, prev_frames: jnp.ndarray, curr_frames: jnp.ndarray) -> FlowResult:
        """Throughput mode: ``[B, H, W]`` frame pairs -> ``[B, P, 2]`` shifts.

        No reference equivalent — the OpenCL kernel processes one frame pair
        per blocking enqueue (``src/FftMethod.cpp:398``); batching is how the
        TPU amortizes dispatch and fills the MXU (SURVEY.md section 2,
        parallelism item 1).
        """
        c = self.config
        # the engine's carry discipline applies to the batched modes too
        # (quantize_8bit rounds float frames to the reference's 8U pixels),
        # keeping step / step_batch / fleet paths numerically consistent
        curr_frames = self._ingest(curr_frames)
        prev_frames = self._ingest(prev_frames)
        exact = _exact_in_bf16(curr_frames) and _exact_in_bf16(prev_frames)
        if c.use_pallas and c.backend == "dft" and c.sample_point_size % 8 == 0:
            # frame-tiled kernel: patch extraction happens in the BlockSpec
            # index map — no patchify copies in HBM (needs sublane-aligned
            # bands: patch % 8 == 0; otherwise the patch-batch kernel below).
            # 8-bit frames pass straight through (the kernel streams uint8
            # into VMEM and casts there — no f32 copy of the batch in HBM)
            from mrs_optic_flow_tpu.ops.pallas_kernels import (
                phase_correlate_frames_pallas,
            )

            raw, resp = phase_correlate_frames_pallas(
                curr_frames, prev_frames,
                patch=c.sample_point_size,
                search_radius=c.search_radius,
                centroid_radius=c.centroid_radius,
                half_spectrum=c.half_spectrum,
                bands_per_step=c.bands_per_step,
                # honor configured step packing only when it divides the batch
                pairs_per_step=(
                    c.pairs_per_step
                    if c.pairs_per_step and curr_frames.shape[0] % c.pairs_per_step == 0
                    else None
                ),
                band_stack=c.band_stack,
                bf16x3=c.mxu_passes,
                exact_inputs=exact,
            )
        else:
            # carry dtype preserved: the fullfused kernel casts in VMEM and
            # 8-bit-exact operands drop the low-order split pass (exact);
            # the non-pallas path casts to f32 inside _correlate
            curr_p = patchify(curr_frames, c.sample_point_size)
            prev_p = patchify(prev_frames, c.sample_point_size)
            raw, resp = self._correlate(curr_p, prev_p, exact=exact)
        shifts = self._gate(raw, c.sample_point_size, c.max_pixel_speed)
        return FlowResult(shifts=shifts, shifts_raw=raw, response=resp)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_batch_long_range(
        self, prev_frames: jnp.ndarray, curr_frames: jnp.ndarray
    ) -> FlowResult:
        """Batched long-range mode: ``[B, H, W]`` frame pairs, both 4x
        downsampled (``src/FftMethod.cpp:1931-1932``), coarser grid — the
        throughput analogue of :meth:`step_long_range` for fleet serving at
        takeoff / low altitude.  Returns ``[B, P_lr, 2]`` shifts."""
        c = self.config
        # bilinear resize interpolates, so the downsampled frames are no
        # longer 8-bit-exact: go through float32 (no exact-input path here);
        # _ingest first so the carry discipline matches step_long_range
        curr_d = resize_by(self._ingest(curr_frames).astype(jnp.float32), c.long_range_ratio)
        prev_d = resize_by(self._ingest(prev_frames).astype(jnp.float32), c.long_range_ratio)
        raw, resp = self._lr_correlate(curr_d, prev_d)
        shifts = self._gate(raw, self.patch_lr, c.max_pixel_speed)
        return FlowResult(shifts=shifts, shifts_raw=raw, response=resp)

    # hashable/static for jax.jit static_argnames=("self",)
    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, FftMethod) and self.config == other.config
