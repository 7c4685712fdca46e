"""Motion decomposition: pixel shifts -> body-frame (rotation rate, velocity).

JAX re-build of ``OpticFlow::getRT`` (``src/optic_flow.cpp:515-774``),
``get2DT`` (``:388-510``) and ``getInliers`` (``:335-358``), with the
reference's data-dependent control flow replaced by masked fixed-shape math
(SURVEY.md section 7 "hard parts": NaN-as-control-flow under jit).

Deliberate deviations from the reference, each documented inline:

1. ``tempTfC2B * axis`` in the reference applies a full tf2 *Transform* to
   the rotation axis — i.e. it also **adds the camera->base translation** to
   the axis before renormalizing (``src/optic_flow.cpp:645``, ``:1747``).
   Rotating a direction must not translate it; we apply the rotation only.
2. ``allSmall`` (``src/optic_flow.cpp:561``) is initialized ``false`` and
   only ever *set* ``false``, so the reference's "No motion detected" branch
   (``:580-585``) is dead code; we do not reproduce the dead branch.
3. ``get2DT`` undistorts the grid points but then uses the *raw pixel*
   differences (``undistShifts`` is built from ``shiftedPts - initialPts``,
   ``src/optic_flow.cpp:448-450``) — reproduced as-is (pixel shifts).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.geometry.homography import (
    decompose_homography,
    find_homography_ransac,
)
from mrs_optic_flow_tpu.geometry.rotations import (
    matrix_from_quat,
    quat_angle,
    quat_axis_angle,
    quat_from_axis_angle,
    quat_from_matrix,
    quat_inverse,
    quat_rotate,
)
from mrs_optic_flow_tpu.geometry.undistort import undistort_points

# Ratio-2 long-range mutual-agreement gate (px).  The reference defines
# ``#define LONGRANGE_INLIER_THRESHOLD 15`` (``src/optic_flow.cpp:34``) and
# passes it to ``getInliers`` at ``:456``; the comparison there is a strict
# ``<`` on the shift-difference norm (``:349``), matched by ``get_inliers``.
LONGRANGE_INLIER_THRESHOLD = 15.0


def grid_centers(frame_size: int, patch: int) -> np.ndarray:
    """Patch-grid centre pixels ``[P, 2]`` in field order ``i + q*j``.

    ``xi = i*S + S/2`` exactly as getRT builds them
    (``src/optic_flow.cpp:538-540``).
    """
    q = frame_size // patch
    i = np.arange(q)
    xs, ys = np.meshgrid(i * patch + patch // 2, i * patch + patch // 2)
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)


def get_inliers(shifts: jnp.ndarray, valid: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Largest mutual-agreement inlier set (``src/optic_flow.cpp:335-358``).

    For each point, counts the points within ``threshold`` of it; returns the
    bool mask of the winning neighbourhood (including the seed point).
    """
    d2 = jnp.sum((shifts[:, None, :] - shifts[None, :, :]) ** 2, axis=-1)
    near = (d2 < threshold * threshold) & valid[None, :] & valid[:, None]
    # the reference counts the seed plus strict neighbours; diagonal is near
    counts = jnp.sum(near, axis=1)
    counts = jnp.where(valid, counts, -1)
    best = jnp.argmax(counts)
    return near[best]


class GetRTResult(NamedTuple):
    ok: jnp.ndarray  # scalar bool
    rot: jnp.ndarray  # [4] quaternion (x,y,z,w): axis + angle/dt encoding
    tran: jnp.ndarray  # [3] camera-frame velocity [m/s]
    n_inliers: jnp.ndarray  # scalar int32
    ang_diff: jnp.ndarray  # scalar: best IMU-consistency angle [rad]
    #: True exactly when the reference would warn "Angle difference greater
    #: than pi/4, skipping." — a solution was found, the homography had
    #: multiple solutions, and the best angle exceeds pi/4
    #: (src/optic_flow.cpp:682-684)
    ang_diff_rejected: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("frame_size", "patch", "shifted_pts_thr", "ransac_iterations"),
)
def get_rt(
    shifts: jnp.ndarray,
    height: jnp.ndarray,
    dt: jnp.ndarray,
    ul_corner_x: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    dist_coeffs: jnp.ndarray,
    c2b_quat: jnp.ndarray,
    ang_rate_quat: jnp.ndarray,
    key: jax.Array,
    *,
    frame_size: int,
    patch: int,
    shifted_pts_thr: int = 8,
    ransac_threshold: float = 0.01,
    ransac_iterations: int = 512,
) -> GetRTResult:
    """``getRT`` (``src/optic_flow.cpp:515-774``): shifts -> (R rate, v).

    Steps: grid centres + NaN mask (``:527-547``) -> local camera matrix with
    ``cx -= ulCorner.x`` (``:524`` — the reference does *not* adjust cy; kept
    for parity) -> undistort (``:549-550``) -> RANSAC homography, threshold
    0.01 (``:558``) -> Malis-Vargas decomposition (``:592``) -> pick the
    solution whose rotation rate is closest (in tf2 angle) to the IMU rate,
    testing both quaternion covers (``:630-671``) -> reject if the best
    solution differs from IMU by more than pi/4 (``:682-684``) -> scale:
    ``v = R (+-t) * height / dt`` (``:701``), rate quaternion with the angle
    divided by dt (``:697``).

    DELIBERATE deviation 24: the RANSAC inlier count is ALSO gated at
    ``shifted_pts_thr`` (the reference gates only the pre-RANSAC valid
    count, ``:547-549``, and would publish a velocity fit from as few as 4
    consenting windows out of 16) — a homography carried by a quarter of
    the grid is a local-texture artifact more often than a motion estimate.
    Same gate on the batched path (``geometry/batched.py::get_rt_batch``).
    """
    centers = jnp.asarray(grid_centers(frame_size, patch))
    valid = jnp.all(jnp.isfinite(shifts), axis=-1)
    shifts_f = jnp.where(valid[:, None], shifts, 0.0)
    shifted = centers + shifts_f

    cam_local = camera_matrix.at[0, 2].add(-ul_corner_x)

    ok = jnp.isfinite(1.0 / dt)
    ok &= jnp.sum(valid) >= shifted_pts_thr

    und_a = undistort_points(centers, cam_local, dist_coeffs)
    und_b = undistort_points(shifted, cam_local, dist_coeffs)

    hres = find_homography_ransac(
        und_a,
        und_b,
        valid,
        key,
        threshold=ransac_threshold,
        iterations=ransac_iterations,
    )
    ok &= hres.ok
    ok &= hres.n_inliers >= shifted_pts_thr

    dec = decompose_homography(hres.h)

    # --- IMU-nearest solution selection (src/optic_flow.cpp:630-671) ---
    quats = quat_from_matrix(dec.rotations)  # [4, 4]
    axes, angles = quat_axis_angle(quats)
    # deviation 1 (module docstring): rotate the axis only, no translation
    axes_b = quat_rotate(c2b_quat[None, :], axes)
    q_rate_b = quat_from_axis_angle(axes_b, angles / dt)
    d_plus = quat_angle(q_rate_b, ang_rate_quat[None, :])
    d_minus = quat_angle(q_rate_b, quat_inverse(ang_rate_quat)[None, :])
    ang_diffs = jnp.minimum(d_plus, d_minus)

    sol_idx = jnp.arange(4)
    usable = sol_idx < dec.n_solutions
    ang_diffs = jnp.where(usable, ang_diffs, jnp.pi + 1.0)
    best = jnp.argmin(ang_diffs)
    best_diff = ang_diffs[best]
    # bestIndex stays -1 if no solution beats the initial pi (strict <, :665)
    found = best_diff < jnp.pi
    ok &= found

    multi = dec.n_solutions > 1
    # pi/4 gate applies on the multi-solution path only (:682-684)
    ang_diff_rejected = found & multi & (best_diff > (jnp.pi / 4))
    ok &= jnp.where(multi, best_diff <= (jnp.pi / 4), True)

    # inverseSolution <=> n_z >= 0 (:657-660); sign flip of t on the
    # multi-solution path only (:700-703)
    inverse_sol = dec.normals[best, 2] >= 0.0
    inv_unit = jnp.where(multi & inverse_sol, -1.0, 1.0)

    r_best = dec.rotations[best]
    t_best = dec.translations[best]
    tran = jnp.matmul(r_best, inv_unit * t_best, precision=jax.lax.Precision.HIGHEST) * height / dt
    rot = quat_from_axis_angle(axes[best], angles[best] / dt)

    finite = jnp.all(jnp.isfinite(tran)) & jnp.all(jnp.isfinite(rot))
    ok &= finite

    nanq = jnp.full((4,), jnp.nan, dtype=rot.dtype)
    nant = jnp.full((3,), jnp.nan, dtype=tran.dtype)
    return GetRTResult(
        ok=ok,
        rot=jnp.where(ok, rot, nanq),
        tran=jnp.where(ok, tran, nant),
        n_inliers=hres.n_inliers,
        ang_diff=best_diff,
        ang_diff_rejected=ang_diff_rejected,
    )


class Get2DTResult(NamedTuple):
    ok: jnp.ndarray  # scalar bool
    tran: jnp.ndarray  # [3] camera-frame velocity [m/s] (z = 0)
    tran_diff: jnp.ndarray  # [3] rate-correction delta (see docstring)


@functools.partial(jax.jit, static_argnames=("long_range_ratio",))
def get_2dt(
    shifts: jnp.ndarray,
    height: jnp.ndarray,
    dt: jnp.ndarray,
    ul_corner_x: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    imu_roll_rate: jnp.ndarray,
    imu_pitch_rate: jnp.ndarray,
    cam_yaw: jnp.ndarray,
    *,
    long_range_ratio: int = 4,
) -> Get2DTResult:
    """``get2DT`` (``src/optic_flow.cpp:388-510``), ratio-4 long-range mode.

    Takes the first valid (finite) pixel shift of the long-range grid
    (``avgShift = undistShifts[0]``, ``:470``; deviation 3 in the module
    docstring: these are raw pixel shifts), applies the roll/pitch-rate
    feed-forward correction (``:478-490``), and converts to metric velocity
    ``v = -shift * height / f * ratio / dt`` (``:491-495``).

    ``ul_corner_x`` is accepted for SIGNATURE PARITY with :func:`get_rt`
    and is deliberately unused: the crop offset only affects undistortion,
    which the long-range path discards (deviation 3) — the reference's
    get2DT likewise never consults the crop origin past the undistort it
    ignores the output of.

    ``tran_diff`` reproduces the reference's double-added correction
    (``avgShift += corr`` happens twice, ``:486-505``), so
    ``tran_diff = -corr * height/f * ratio / dt`` — the topic published as
    ``velocity_out_longrange_diff`` (``src/optic_flow.cpp:1831``).

    DEVIATION 21 (ARCHITECTURE.md): the rate feed-forward AXIS MAP is
    rebuilt from first principles instead of transcribing ``:478-488``.
    A camera rotating with camera-frame angular velocity ``w`` shifts the
    image centre's content by ``f * (-w_y, +w_x) * dt`` (small-rotation
    flow of ``d2 = R(-w dt) d1`` at ``d = z``), so the cancelling
    correction is ``(+fx tan(w_y dt), -fy tan(w_x dt)) / ratio`` — a
    det(+1) map from (roll, pitch) to (x, y).  The reference's
    ``(-fx tan(roll dt), +fy tan(pitch dt))`` rotated by ``cam_yaw`` is a
    det(-1) family: NO cam_yaw value can cancel rotational flow for any
    mounting — on a banked low-altitude flight it grows the error it is
    meant to remove (closed-loop evidence: tests/test_flightsim.py's
    banked long-range flight; the brake-phase velocity RMSE triples with
    the transcribed formula).  ``cam_yaw`` keeps the reference's
    convention (``cam_yaw = yaw(base->camera) + pi/2``,
    ``src/optic_flow.cpp:1203-1208``), i.e. a pure-z mount yaw of
    ``psi = pi/2 - cam_yaw`` maps body rates to camera rates.
    """
    fx = camera_matrix[0, 0]
    fy = camera_matrix[1, 1]
    mult = float(long_range_ratio)

    valid = jnp.all(jnp.isfinite(shifts), axis=-1)
    shifts_f = jnp.where(valid[:, None], shifts, 0.0)
    if long_range_ratio == 2:
        # ratio-2 policy (src/optic_flow.cpp:414-421, :452-467): need >= 3
        # valid points, mutual-agreement inliers within the long-range
        # threshold, >= 3 inliers, average over the inlier set
        ok = jnp.isfinite(1.0 / dt) & (jnp.sum(valid) >= 3)
        inl = get_inliers(shifts_f, valid, LONGRANGE_INLIER_THRESHOLD)
        ok &= jnp.sum(inl) >= 3
        w = inl.astype(shifts.dtype)
        avg = jnp.sum(shifts_f * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        # ratio-4 policy: the first valid shift (src/optic_flow.cpp:423-427,
        # :470)
        ok = jnp.isfinite(1.0 / dt) & jnp.any(valid)
        first = jnp.argmax(valid)
        avg = jnp.where(valid[first], shifts[first], jnp.zeros((2,), shifts.dtype))

    # roll/pitch rate feed-forward (:478-488, axis map rebuilt — see
    # DEVIATION 21 in the docstring): body rates -> camera rates through
    # the pure-z mount yaw implied by the reference's cam_yaw convention,
    # then the centre-flow cancelling correction
    psi = jnp.pi / 2 - cam_yaw  # mount yaw (identity mount -> 0)
    w_cx = jnp.cos(psi) * imu_roll_rate + jnp.sin(psi) * imu_pitch_rate
    w_cy = -jnp.sin(psi) * imu_roll_rate + jnp.cos(psi) * imu_pitch_rate
    x_corr = jnp.tan(w_cy * dt) * fx / mult
    y_corr = -jnp.tan(w_cx * dt) * fy / mult
    corr = jnp.stack([x_corr, y_corr])

    scale = jnp.stack([height / fx * mult, height / fy * mult])

    a1 = avg + corr
    tran = -jnp.concatenate([a1 * scale, jnp.zeros((1,), shifts.dtype)]) / dt
    a2 = avg + 2.0 * corr
    tran_corr = -jnp.concatenate([a2 * scale, jnp.zeros((1,), shifts.dtype)]) / dt
    tran_diff = tran_corr - tran

    nant = jnp.full((3,), jnp.nan, dtype=tran.dtype)
    return Get2DTResult(
        ok=ok,
        tran=jnp.where(ok, tran, nant),
        tran_diff=jnp.where(ok, tran_diff, nant),
    )
