"""Pinhole undistortion — the equivalent of ``cv::undistortPoints``.

The reference undistorts the patch-grid centres and their shifted positions
before the homography fit (``src/optic_flow.cpp:549-550``,
``src/optic_flow.cpp:441-442``) using the 5-coefficient radial-tangential
model ``(k1, k2, p1, p2, k3)`` loaded from camera_info
(``src/optic_flow.cpp:1499-1519``).

``cv::undistortPoints`` inverts the distortion by fixed-point iteration with
a hard default of 5 iterations; ``iterations=5`` reproduces OpenCV to ~2e-7.
Note that 5 iterations is *not* converged for strong wide-angle distortion
(re-distorting OpenCV's result misses the input by >1 px at the frame edge,
while 40 iterations round-trips to <1e-4 px) — pass a higher count when
accuracy matters more than byte-parity with the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def distort_points(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply the radial-tangential model to normalized coords ``[..., 2]``."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    pts: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    dist: jnp.ndarray | None,
    *,
    iterations: int = 5,
) -> jnp.ndarray:
    """Pixel points ``[..., 2]`` -> undistorted *normalized* coords ``[..., 2]``.

    Matches ``cv::undistortPoints(pts, out, K, dist)`` with no rectification
    / new camera matrix, exactly the call in getRT
    (``src/optic_flow.cpp:549``).

    ``dist=None`` statically skips the fixed-point inversion (a distortion-
    free camera): just the ``K^-1`` normalization.  The iteration is unrolled
    (``iterations`` is static) so XLA fuses the whole polynomial chain — a
    ``fori_loop`` over a ~15-op body is pure scheduling overhead at this
    size.
    """
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    xd = (pts[..., 0] - cx) / fx
    yd = (pts[..., 1] - cy) / fy
    if dist is None:
        return jnp.stack([xd, yd], axis=-1)

    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xd, yd
    for _ in range(iterations):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) * icdist
        y = (yd - dy) * icdist
    return jnp.stack([x, y], axis=-1)
