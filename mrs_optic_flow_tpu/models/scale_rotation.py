"""Scale / rotation estimator via log-polar phase correlation.

Rebuild of ``scaleRotationEstimator`` (``src/scaleRotationEstimator.cpp``):
log-polar transform of each frame, phase correlation of consecutive
log-polar images, decode ``scale = exp(dx / M)``, ``rot = (dy / Ky) * pi/180``
(``:123-124``).  The node maps scale to vertical velocity and rotation to
yaw rate (``scale_rot_output``, ``config/default.yaml:15``; the wiring in the
reference node is commented out, ``src/optic_flow.cpp:1629-1650`` — here it
is live through the runtime layer).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

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


class ScaleRotationEstimator:
    def __init__(self, config: ScaleRotationConfig = ScaleRotationConfig()):
        self.config = config
        #: Ky = resolution / 360 (src/scaleRotationEstimator.cpp:28)
        self.ky = config.resolution / 360.0

    def init_state(self) -> ScaleRotState:
        n = self.config.resolution
        return ScaleRotState(
            prev_logpolar=jnp.zeros((n, n), jnp.float32), first=jnp.asarray(True)
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def step(
        self, state: ScaleRotState, frame: jnp.ndarray
    ) -> Tuple[ScaleRotState, ScaleRotResult]:
        """``processImage`` (``src/scaleRotationEstimator.cpp:34-148``).

        The first frame returns (1, 0) (``:74-75``), as does an
        out-of-range correlation peak (``:119-121``).
        """
        c = self.config
        n = c.resolution
        lp = logpolar(jnp.asarray(frame, jnp.float32), jnp.float32(c.magnitude))
        prev_lp = jnp.where(state.first, lp, state.prev_logpolar)

        # cv::phaseCorrelate(curr_lp, prev_lp) (:117); our field convention is
        # the negation of OpenCV's return (src/FftMethod.cpp:1836)
        surf = correlation_surface(lp, prev_lp, search_radius=n // 2)
        shift, _resp = peak_refine(surf)
        pt = -shift  # back to the cv::phaseCorrelate sign used at :123-124

        in_range = jnp.abs(pt[0]) <= n / 2  # (:119, both checks test pt.x)
        scale = jnp.where(
            state.first | ~in_range, 1.0, jnp.exp(pt[0] / c.magnitude)
        )
        rot = jnp.where(
            state.first | ~in_range, 0.0, (pt[1] / self.ky) * (jnp.pi / 180.0)
        )
        new_state = ScaleRotState(prev_logpolar=lp, first=jnp.asarray(False))
        return new_state, ScaleRotResult(scale=scale, rotation=rot)

    @functools.partial(jax.jit, static_argnames=("self",))
    def step_batch(
        self, prev_frames: jnp.ndarray, curr_frames: jnp.ndarray
    ) -> ScaleRotResult:
        """Stateless batched mode: ``[B, N, N]`` frame pairs ->
        per-pair (scale [B], rotation [B]).  The throughput analogue of
        :meth:`step` (no reference equivalent — the reference is strictly
        frame-to-frame); same decode as ``src/scaleRotationEstimator.cpp:
        117-124``."""
        c = self.config
        n = c.resolution

        def one(prev, curr):
            lp_p = logpolar(jnp.asarray(prev, jnp.float32), jnp.float32(c.magnitude))
            lp_c = logpolar(jnp.asarray(curr, jnp.float32), jnp.float32(c.magnitude))
            surf = correlation_surface(lp_c, lp_p, search_radius=n // 2)
            shift, _resp = peak_refine(surf)
            pt = -shift
            in_range = jnp.abs(pt[0]) <= n / 2
            scale = jnp.where(in_range, jnp.exp(pt[0] / c.magnitude), 1.0)
            rot = jnp.where(in_range, (pt[1] / self.ky) * (jnp.pi / 180.0), 0.0)
            return scale, rot

        scale, rot = jax.vmap(one)(prev_frames, curr_frames)
        return ScaleRotResult(scale=scale, rotation=rot)

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, ScaleRotationEstimator) and self.config == other.config
