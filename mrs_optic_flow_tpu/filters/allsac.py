"""allsac / ransac means and bounding filters (``src/utilityFunctions.cpp``).

"Allsac" is the reference's deterministic RANSAC variant: instead of random
subsets it scores *every pair* of points (O(n^2) hypotheses,
``src/utilityFunctions.cpp:58-95``).  With n = 16 grid windows that is 256
hypotheses — a perfect fit for one vectorized pass on the VPU instead of the
reference's nested host loops.

All functions take an explicit validity mask instead of physically removing
NaN entries (``removeNanPoints``, ``src/utilityFunctions.cpp:245-263``) so
they stay fixed-shape under jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def rotate_2d(pts: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``[..., 2]`` points by alpha (``src/utilityFunctions.cpp:4-22``)."""
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    x, y = pts[..., 0], pts[..., 1]
    return jnp.stack([x * c - y * s, x * s + y * c], axis=-1)


def point_mean(pts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """NaN-aware mean (``pointMean``, ``src/utilityFunctions.cpp:26-44``):
    mean over valid points, or (NaN, NaN) if none."""
    w = valid.astype(pts.dtype)
    n = jnp.sum(w)
    m = jnp.sum(pts * w[..., None], axis=0) / jnp.maximum(n, 1.0)
    return jnp.where(n > 0, m, jnp.nan)


@functools.partial(jax.jit, static_argnames=())
def allsac_mean(
    pts: jnp.ndarray, valid: jnp.ndarray, threshold_radius_sq: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs consensus mean (``allsacMean``, ``src/utilityFunctions.cpp:58-95``).

    For every (i, j) pair (i <= j, including i == j — the reference's inner
    loop starts at ``j = i``): take the two-point mean, count the points
    within ``threshold_radius_sq``, keep the hypothesis with the most; the
    result is the mean of its consensus set.  Ties resolve to the earliest
    pair in (i, j) scan order, like the reference's strict ``>`` update.

    Returns ``(mean [2], chosen_count)``; with <= 2 valid points falls back
    to the plain mean (``:60-62``).
    """
    n = pts.shape[0]
    pts_f = jnp.where(valid[:, None], pts, 0.0)

    mid = 0.5 * (pts_f[:, None, :] + pts_f[None, :, :])  # [n, n, 2]
    pair_ok = valid[:, None] & valid[None, :]
    iu = jnp.triu(jnp.ones((n, n), bool))  # j >= i scan order
    pair_ok &= iu

    d2 = jnp.sum((mid[:, :, None, :] - pts_f[None, None, :, :]) ** 2, axis=-1)
    members = (d2 < threshold_radius_sq) & valid[None, None, :]  # [n, n, k]
    counts = jnp.where(pair_ok, jnp.sum(members, axis=-1), -1)

    flat = counts.reshape(-1)
    best = jnp.argmax(flat)  # first max in scan order
    best_members = members.reshape(n * n, n)[best]
    best_count = flat[best]

    consensus = point_mean(pts_f, best_members)
    fallback = point_mean(pts_f, valid)
    few = jnp.sum(valid) <= 2
    mean = jnp.where(few, fallback, consensus)
    chosen = jnp.where(few, jnp.sum(valid), best_count)
    return mean, chosen


@functools.partial(jax.jit, static_argnames=())
def allsac_mean_1d(
    vals: jnp.ndarray, valid: jnp.ndarray, threshold_radius: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scalar variant (``src/utilityFunctions.cpp:105-142``)."""
    n = vals.shape[0]
    v = jnp.where(valid, vals, 0.0)
    mid = 0.5 * (v[:, None] + v[None, :])
    pair_ok = valid[:, None] & valid[None, :] & jnp.triu(jnp.ones((n, n), bool))
    d = jnp.abs(mid[:, :, None] - v[None, None, :])
    members = (d < threshold_radius) & valid[None, None, :]
    counts = jnp.where(pair_ok, jnp.sum(members, axis=-1), -1)
    flat = counts.reshape(-1)
    best = jnp.argmax(flat)
    bm = members.reshape(n * n, n)[best]
    w = bm.astype(v.dtype)
    consensus = jnp.sum(v * w) / jnp.maximum(jnp.sum(w), 1.0)
    # zero valid values => NaN, not a fabricated 0.0 — the reference's
    # calcMean over an empty vector is 0/0 (src/utilityFunctions.cpp:105-142)
    n_valid = jnp.sum(valid)
    fallback = jnp.where(
        n_valid > 0, jnp.sum(v * valid) / jnp.maximum(n_valid, 1.0), jnp.nan
    )
    few = n_valid <= 2
    return jnp.where(few, fallback, consensus), jnp.where(few, n_valid, flat[best])


@functools.partial(jax.jit, static_argnames=("num_of_chosen", "num_of_iterations"))
def ransac_mean(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_radius_sq: jnp.ndarray,
    key: jax.Array,
    *,
    num_of_chosen: int = 2,
    num_of_iterations: int = 50,
) -> jnp.ndarray:
    """Randomized consensus mean (``ransacMean``, ``src/utilityFunctions.cpp:182-216``).

    The reference draws ``num_of_chosen`` points *with replacement*
    (``rand() % size``, ``:194``) per iteration; defaults from
    ``config/default.yaml:47-48``.
    """
    n = pts.shape[0]
    pts_f = jnp.where(valid[:, None], pts, 0.0)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    def hypothesis(k):
        idx = jax.random.choice(k, n, shape=(num_of_chosen,), replace=True, p=p)
        center = jnp.mean(pts_f[idx], axis=0)
        d2 = jnp.sum((pts_f - center) ** 2, axis=-1)
        members = (d2 < threshold_radius_sq) & valid
        return members, jnp.sum(members)

    keys = jax.random.split(key, num_of_iterations)
    members, counts = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(counts)
    fallback = point_mean(pts_f, valid)
    consensus = point_mean(pts_f, members[best])
    return jnp.where(jnp.sum(valid) <= num_of_chosen, fallback, consensus)


def bound_abs_mask(pts: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """|p| < bound mask (``getOnlyInAbsBound``, ``src/utilityFunctions.cpp:218-231``)."""
    if pts.ndim == 1:
        return jnp.abs(pts) < bound
    return jnp.sum(pts * pts, axis=-1) < bound * bound


def bound_radius_mask(
    pts: jnp.ndarray, expected: jnp.ndarray, radius: jnp.ndarray
) -> jnp.ndarray:
    """distance-from-expected mask (``getOnlyInRadiusFromExpected``,
    ``src/utilityFunctions.cpp:265-281``)."""
    return jnp.sum((pts - expected) ** 2, axis=-1) < radius * radius
