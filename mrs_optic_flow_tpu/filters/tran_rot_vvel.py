"""9-vector translation / yaw-rate / climb-rate decomposition
(``estimateTranRotVvel``, ``src/utilityFunctions.cpp:347-495``).

Given the flow vectors of a 3x3 sample grid (input in column-major order:
``vectors = [r1 r4 r7 r2 r5 r8 r3 r6 r9]`` for row-major grid cells r1..r9,
``src/utilityFunctions.cpp:360-369``) at grid arm length ``a`` pixels,
estimates:

- **translation** from the 4 opposite-pair means + the centre vector,
  allsac-fused (``:371-399``);
- **yaw rate** from the rotational component of the 8 outer vectors after
  translation removal (``:417-447``, averaged ``:461-466``);
- **vertical velocity** from the radial (scale) component (``:469-478``),

with the reference's exact unit dance: y flipped on input (``:358``), the
translation allsac done in m/s (``:388``), converted back to pixels with a
*negated* y (``:395-396``), and absolute bounds mapping to NaN (``:483-489``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.filters.allsac import allsac_mean


class TranRotVvel(NamedTuple):
    tran: jnp.ndarray  # [2] translation estimate [px, reference convention]
    rot: jnp.ndarray  # scalar yaw rate [rad/s], NaN if out of bounds
    vvel: jnp.ndarray  # scalar vertical velocity [m/s], NaN if out of bounds


@functools.partial(jax.jit, static_argnames=())
def estimate_tran_rot_vvel(
    vectors: jnp.ndarray,
    a: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    range_: jnp.ndarray,
    allsac_radius_sq: jnp.ndarray,
    duration: jnp.ndarray,
    max_vert_speed: jnp.ndarray,
    max_yaw_speed: jnp.ndarray,
) -> TranRotVvel:
    """``vectors``: [9, 2] column-major 3x3 grid flow; NaNs tolerated."""
    v = vectors * jnp.asarray([1.0, -1.0], vectors.dtype)  # flip y (:358)
    # unpack to row-major r1..r9 (:360-369)
    r1, r4, r7, r2, r5, r8, r3, r6, r9 = (v[i] for i in range(9))

    # translation hypotheses: opposite pairs + centre (:373-379)
    t_est = jnp.stack(
        [0.5 * (r1 + r9), 0.5 * (r3 + r7), 0.5 * (r2 + r8), 0.5 * (r4 + r6), r5]
    )
    t_valid = jnp.all(jnp.isfinite(t_est), axis=-1)
    t_est = jnp.where(t_valid[:, None], t_est, 0.0)
    # to m/s (:388), allsac (:392), back to px with y negated (:395-396)
    scale = jnp.stack([range_ / (fx * duration), range_ / (fy * duration)])
    tr_ms, _chosen = allsac_mean(t_est * scale, t_valid, allsac_radius_sq)
    tr = tr_ms * jnp.stack([fx * duration / range_, -(fy * duration) / range_])

    # remove translation from the outer vectors (:411-419)
    r1, r2, r3, r4 = r1 - tr, r2 - tr, r3 - tr, r4 - tr
    r6, r7, r8, r9 = r6 - tr, r7 - tr, r8 - tr, r9 - tr

    # rotation / scale components (:421-447)
    r_est = jnp.stack(
        [
            (r1[1] + r1[0]) / 2,
            (-r9[0] - r9[1]) / 2,
            (r3[0] - r3[1]) / 2,
            (r7[1] - r7[0]) / 2,
            r4[1],
            -r6[1],
            r2[0],
            -r8[0],
        ]
    )
    s_est = jnp.stack(
        [
            (r1[1] - r1[0]) / 2,
            (-r9[1] + r9[0]) / 2,
            (r3[1] + r3[0]) / 2,
            (-r7[1] - r7[0]) / 2,
            -r4[0],
            r6[0],
            r2[1],
            -r8[1],
        ]
    )
    r_valid = jnp.isfinite(r_est)
    s_valid = jnp.isfinite(s_est)

    # yaw rate: mean of r_est / (duration * a)  (:461-466); with zero valid
    # estimates the reference divides by size()==0 -> NaN (invalid => NaN),
    # not a fabricated 0 rad/s
    rot = jnp.sum(jnp.where(r_valid, r_est, 0.0)) / (
        jnp.maximum(jnp.sum(r_valid), 1) * duration * a
    )
    rot = jnp.where(jnp.any(r_valid), rot, jnp.nan)
    # climb rate: mean of s_est * range / (duration * a)  (:469-478)
    vvel = (
        jnp.sum(jnp.where(s_valid, s_est, 0.0))
        / jnp.maximum(jnp.sum(s_valid), 1)
        * range_
        / (duration * a)
    )
    vvel = jnp.where(jnp.any(s_valid), vvel, jnp.nan)

    rot = jnp.where(jnp.abs(rot) > max_yaw_speed, jnp.nan, rot)  # (:483-485)
    vvel = jnp.where(jnp.abs(vvel) > max_vert_speed, jnp.nan, vvel)  # (:487-489)
    return TranRotVvel(tran=tr, rot=rot, vvel=vvel)
