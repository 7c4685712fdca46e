"""Scale / rotation estimator via log-polar phase correlation.

Rebuild of ``scaleRotationEstimator`` (``src/scaleRotationEstimator.cpp``):
log-polar transform of each frame (Lanczos4, ``:113``), phase correlation of
consecutive log-polar images, decode ``scale = exp(dx / M)``,
``rot = (dy / Ky) * pi/180`` (``:123-124``).  The node maps scale to vertical
velocity and rotation to yaw rate (``scale_rot_output``,
``config/default.yaml:15``; the wiring in the reference node is commented
out, ``src/optic_flow.cpp:1629-1650`` — here it is live through the runtime
layer).

TPU-first design (unlike the reference's single CPU ``cv::phaseCorrelate``
call): the correlation runs through the matmul-DFT backend — two ``[N, N]``
MXU matmul pairs per transform — with the fused Pallas peak/centroid stage,
the same fast path the flow engine uses (``docs/PERFORMANCE.md`` measured
the XLA-FFT lowering ~18x slower on this backend).  ``lp_resolution``
optionally shrinks the log-polar image (decode constants are rescaled so
the configured ``magnitude`` semantics are preserved); ``step_batch`` is the
fleet/throughput variant, and :class:`~mrs_optic_flow_tpu.runtime.fleet.FleetServer`
exposes it per tick.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.ops.logpolar import logpolar
from mrs_optic_flow_tpu.ops.phase_correlate import correlation_surface, peak_refine


class ScaleRotState(NamedTuple):
    prev_logpolar: jnp.ndarray  # [N, N] float32
    first: jnp.ndarray  # scalar bool


class ScaleRotResult(NamedTuple):
    scale: jnp.ndarray  # scalar: frame-to-frame scale factor (1.0 = none)
    rotation: jnp.ndarray  # scalar: frame-to-frame rotation [rad]


@dataclasses.dataclass(frozen=True)
class ScaleRotationConfig:
    resolution: int = 480  # square frame size (ctor arg, :5)
    magnitude: float = 49.9  # optimM (scale_rot_magnitude, config/default.yaml:14)
    #: log-polar image size; None = ``resolution`` (reference geometry).
    #: Smaller trades decode granularity for speed — magnitude and Ky are
    #: rescaled by ``lp_resolution / resolution`` so the decode stays
    #: consistent with the configured ``magnitude``.
    lp_resolution: Optional[int] = None
    #: log-polar interpolation: "lanczos4" (the reference's INTER_LANCZOS4,
    #: src/scaleRotationEstimator.cpp:113) or "bilinear" (cheaper; accuracy
    #: delta quantified in tests/test_logpolar.py)
    interp: str = "lanczos4"
    backend: str = "dft"  # dft (MXU matmul) | fft (XLA FFT)
    use_pallas: bool = True  # fused peak/centroid stage (useOCL analogue)
    #: output rows per ``lax.map`` step of the log-polar resample — bounds
    #: the dense one-hot weight temporaries (``ops/logpolar.py``); tuned by
    #: ``scripts/tune_scale_rotation.py``
    lp_rows_per_chunk: int = 8
    #: round incoming float grays to uint8 before the log-polar resample —
    #: the reference feeds its 8-bit gray pipeline into ``cv::logPolar``
    #: (``src/scaleRotationEstimator.cpp:108-113`` on the CV_8UC1 imCurr),
    #: and 8-bit-exact inputs let the resample drop one of its three bf16
    #: MXU passes (``ops/logpolar.py``)
    quantize_8bit: bool = True

    @property
    def lp_res(self) -> int:
        return self.lp_resolution or self.resolution


class ScaleRotationEstimator:
    def __init__(self, config: ScaleRotationConfig = ScaleRotationConfig()):
        # fail at construction, not at the first traced step (the same
        # strict-load discipline as FftMethodConfig.normalized())
        if config.backend not in ("dft", "fft"):
            raise ValueError(
                f"unknown backend {config.backend!r} (expected 'fft' or 'dft')"
            )
        if config.interp not in ("lanczos4", "bilinear"):
            raise ValueError(
                f"unknown interp {config.interp!r} "
                "(expected 'lanczos4' or 'bilinear')"
            )
        self.config = config
        r = config.lp_res / config.resolution
        #: effective optimM at the log-polar resolution
        self.m_eff = config.magnitude * r
        #: Ky = lp_rows / 360 (src/scaleRotationEstimator.cpp:28 at r=1)
        self.ky = config.lp_res / 360.0

    def init_state(self) -> ScaleRotState:
        n = self.config.lp_res
        dt = jnp.uint8 if self.config.quantize_8bit else jnp.float32
        return ScaleRotState(
            prev_logpolar=jnp.zeros((n, n), dt), first=jnp.asarray(True)
        )

    # -- internals -----------------------------------------------------------

    def _ingest(self, frame: jnp.ndarray) -> jnp.ndarray:
        """Frame as resampled: rounded uint8 when ``quantize_8bit`` (the
        reference's 8-bit pipeline; pass-through for already-8-bit input),
        float32 otherwise — the same contract as ``FftMethod._ingest``."""
        if not self.config.quantize_8bit:
            return jnp.asarray(frame, jnp.float32)
        from mrs_optic_flow_tpu.ops.preprocess import quantize_u8

        return quantize_u8(frame)

    def _logpolar(self, frame: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        # uint8 frames are exact in bf16, letting the resample drop one of
        # its three MXU passes (ops/logpolar.py)
        lp = logpolar(
            self._ingest(frame),
            self.m_eff,
            resolution=c.lp_res,
            interp=c.interp,
            rows_per_chunk=c.lp_rows_per_chunk,
        )
        if not c.quantize_8bit:
            return lp
        # the reference's cv::logPolar writes an 8-bit image (tempIm is
        # CV_8UC1 because imCurr is) and converts to CV_32F only for
        # cv::phaseCorrelate (src/scaleRotationEstimator.cpp:108-117), so
        # the correlated data — and the carried previous image — is
        # round-and-saturated to 8 bits.  Also 4x less HBM for the fleet's
        # per-stream carry, and the correlation inputs become 8-bit-exact.
        from mrs_optic_flow_tpu.ops.preprocess import quantize_u8

        return quantize_u8(lp)

    def _correlate(self, lp_c: jnp.ndarray, lp_p: jnp.ndarray):
        """Phase-correlate log-polar images ``[..., N, N]`` on the MXU path;
        returns ``(shift [..., 2], maxval [...])``."""
        c = self.config
        n = c.lp_res
        surf = correlation_surface(
            lp_c, lp_p, search_radius=n // 2, backend=c.backend
        )
        if c.use_pallas:
            from mrs_optic_flow_tpu.ops.pallas_kernels import peak_refine_pallas

            lead = surf.shape[:-2]
            s, m = peak_refine_pallas(surf.reshape((-1, n, n)))
            return s.reshape(lead + (2,)), m.reshape(lead)
        return peak_refine(surf)

    def _decode(self, shift: jnp.ndarray, gate: jnp.ndarray):
        """``pt`` -> (scale, rot) per ``src/scaleRotationEstimator.cpp:
        119-124``; ``gate`` True forces the no-estimate result (1, 0)."""
        n = self.config.lp_res
        pt = -shift  # back to the cv::phaseCorrelate sign (src/FftMethod.cpp:1836)
        in_range = jnp.abs(pt[..., 0]) <= n / 2  # (:119, both checks test pt.x)
        bad = gate | ~in_range
        scale = jnp.where(bad, 1.0, jnp.exp(pt[..., 0] / self.m_eff))
        rot = jnp.where(bad, 0.0, (pt[..., 1] / self.ky) * (jnp.pi / 180.0))
        return scale, rot

    # -- public steps ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def step(
        self, state: ScaleRotState, frame: jnp.ndarray
    ) -> Tuple[ScaleRotState, ScaleRotResult]:
        """``processImage`` (``src/scaleRotationEstimator.cpp:34-148``).

        The first frame returns (1, 0) (``:74-75``), as does an
        out-of-range correlation peak (``:119-121``).
        """
        lp = self._logpolar(frame)
        prev_lp = jnp.where(state.first, lp, state.prev_logpolar)
        shift, _resp = self._correlate(lp, prev_lp)
        scale, rot = self._decode(shift, state.first)
        new_state = ScaleRotState(prev_logpolar=lp, first=jnp.asarray(False))
        return new_state, ScaleRotResult(scale=scale, rotation=rot)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_batch(
        self, prev_frames: jnp.ndarray, curr_frames: jnp.ndarray
    ) -> ScaleRotResult:
        """Stateless batched mode: ``[B, N, N]`` frame pairs ->
        per-pair (scale [B], rotation [B]).  The throughput/fleet analogue
        of :meth:`step` (no reference equivalent — the reference is strictly
        frame-to-frame); same decode as ``src/scaleRotationEstimator.cpp:
        117-124``.  The log-polar resample is vmapped; the correlation runs
        as ONE batched MXU program."""
        lp_p = jax.vmap(self._logpolar)(prev_frames)
        lp_c = jax.vmap(self._logpolar)(curr_frames)
        shift, _resp = self._correlate(lp_c, lp_p)
        scale, rot = self._decode(shift, jnp.zeros(shift.shape[:-1], bool))
        return ScaleRotResult(scale=scale, rotation=rot)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_batch_carried(
        self, prev_lp: jnp.ndarray, curr_frames: jnp.ndarray
    ) -> Tuple[jnp.ndarray, ScaleRotResult]:
        """Fleet-serving variant: previous frames enter as already-computed
        log-polar images (carried on device across ticks, like the
        FleetServer's preprocessed ``prev``), so each tick pays ONE log-polar
        resample per stream instead of two.  Returns ``(curr_lp, result)``;
        feed ``curr_lp`` back as the next tick's ``prev_lp``."""
        lp_c = jax.vmap(self._logpolar)(curr_frames)
        shift, _resp = self._correlate(lp_c, prev_lp)
        scale, rot = self._decode(shift, jnp.zeros(shift.shape[:-1], bool))
        return lp_c, ScaleRotResult(scale=scale, rotation=rot)

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, ScaleRotationEstimator) and self.config == other.config
