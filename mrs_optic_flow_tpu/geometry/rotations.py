"""Quaternion / rotation-matrix utilities with tf2 conventions.

The reference leans on tf2 (Bullet) quaternion math throughout its motion
decomposition (``src/optic_flow.cpp:630-722``).  These are the exact
operations it uses, reimplemented for JAX:

- quaternions are ``(x, y, z, w)`` like ``tf2::Quaternion``;
- :func:`quat_angle` is tf2's ``Quaternion::angle`` — ``acos(dot)`` of the
  normalized quaternions, *not* the shortest-path double-cover variant (the
  reference compensates by also testing against the inverse,
  ``src/optic_flow.cpp:646-655``);
- :func:`rpy_from_matrix` follows ``tf2::Matrix3x3::getRPY`` solution 1
  (ZYX extrinsic / xyz-fixed-axis convention).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """tf2 inverse of a unit quaternion: conjugate."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q (tf2 ``quatRotate``)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """tf2 ``Quaternion(axis, angle)`` — axis is normalized internally."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = jnp.asarray(angle)[..., None] * 0.5
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_axis_angle(q: jnp.ndarray) -> tuple:
    """tf2 ``getAxis()``/``getAngle()``: angle in [0, 2*pi), axis unit.

    tf2's getAngle returns ``2*acos(w)`` without shortest-path folding.
    """
    q = quat_normalize(q)
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s2 = 1.0 - w * w
    # tf2 returns (1,0,0) for near-identity rotations
    safe = s2 >= 10.0 * jnp.finfo(q.dtype).eps
    s = jnp.sqrt(jnp.where(safe, s2, 1.0))
    axis = jnp.where(
        safe[..., None],
        q[..., :3] / s[..., None],
        jnp.asarray([1.0, 0.0, 0.0], dtype=q.dtype),
    )
    return axis, angle


def quat_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """tf2 ``Quaternion::angle``: acos of the normalized dot product."""
    d = jnp.sum(a * b, axis=-1) / jnp.sqrt(
        jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1)
    )
    return jnp.arccos(jnp.clip(d, -1.0, 1.0))


def quat_from_rpy(roll, pitch, yaw) -> jnp.ndarray:
    """tf2 ``setRPY`` (fixed-axis XYZ: yaw about Z, then pitch Y, then roll X)."""
    hr, hp, hy = (jnp.asarray(a) * 0.5 for a in (roll, pitch, yaw))
    sr, cr = jnp.sin(hr), jnp.cos(hr)
    sp, cp = jnp.sin(hp), jnp.cos(hp)
    sy, cy = jnp.sin(hy), jnp.cos(hy)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix of a unit quaternion (tf2 ``Matrix3x3(q)``)."""
    x, y, z, w = jnp.moveaxis(quat_normalize(q), -1, 0)
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Quaternion of a rotation matrix — branch-free Shepperd's method.

    Replaces ``tf2::Transform::getRotation`` in the solution-selection loop
    of getRT (``src/optic_flow.cpp:639-640``).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best by max pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / jnp.maximum(
        4.0 * qw0, 1e-12
    )[..., None]
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / jnp.maximum(
        4.0 * qx1, 1e-12
    )[..., None]
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / jnp.maximum(
        4.0 * qy2, 1e-12
    )[..., None]
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / jnp.maximum(
        4.0 * qz3, 1e-12
    )[..., None]

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def rpy_from_matrix(m: jnp.ndarray) -> tuple:
    """tf2 ``Matrix3x3::getRPY`` solution 1.

    Used wherever the reference converts orientations/rates to Euler angles
    (e.g. ``src/optic_flow.cpp:628``, publishing ``src/optic_flow.cpp:1759``).
    """
    sp = -m[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    # at the exact gimbal singularity (|pitch| == pi/2, measure-zero and far
    # outside a downward-camera UAV's envelope) roll and yaw are reported 0;
    # tf2's getRPY folds the combined angle into roll there
    # (ARCHITECTURE.md deviation 16)
    gimbal = jnp.abs(sp) >= 1.0 - 1e-9
    zero = jnp.zeros_like(pitch)
    roll = jnp.where(gimbal, zero, jnp.arctan2(m[..., 2, 1], m[..., 2, 2]))
    yaw = jnp.where(gimbal, zero, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]))
    return roll, pitch, yaw


def rpy_from_quat(q: jnp.ndarray) -> tuple:
    return rpy_from_matrix(matrix_from_quat(q))
