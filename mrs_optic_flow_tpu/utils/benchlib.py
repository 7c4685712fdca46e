"""Shared honest-measurement harness for device throughput numbers.

Two hazards make naive TPU benchmarks lie (docs/PERFORMANCE.md, rule 5):
repeated dispatch of identical (program, input) pairs can be deduplicated
below the client (tunnelled backends especially), and un-materialized
results let the host race ahead of the device.  Every throughput number in
this repo (``bench.py``, ``scripts/tune_frames_kernel.py``) goes through
this module: iterations are chained on data (each input derives from the
previous output) and every result is materialized on the host.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_chained(step: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]):
    """Wrap ``step(prev, curr) -> (result, bump_scalar)`` into a jitted
    ``chained(prev, curr) -> (next_prev, result)`` where ``next_prev``
    depends on the step's output — so no iteration can be elided or
    deduplicated.  The bump stays small (wrap-add of 1..3) and preserves
    ``prev``'s dtype (uint8 wraps, float drifts negligibly)."""

    @jax.jit
    def chained(prev, curr):
        result, bump_scalar = step(prev, curr)
        bump = (jnp.nan_to_num(bump_scalar) % 3.0 + 1.0).astype(prev.dtype)
        return prev + bump, result

    return chained


def measure_chained(
    chained,
    prev: jnp.ndarray,
    curr: jnp.ndarray,
    *,
    items_per_call: int,
    iters: int = 16,
    pipeline: int = 1,
    warmup: int = 3,
) -> float:
    """Steady-state items/sec of a :func:`make_chained` function.

    ``pipeline`` calls are kept in flight per timed window (a streaming
    consumer's shape); every window's results are materialized on the host.
    Returns the p50 of per-window rates (robust to scheduler jitter).
    """
    p, s = chained(prev, curr)
    np.asarray(s)
    for _ in range(warmup):
        p, s = chained(p, curr)
        np.asarray(s)
    times = []
    for _ in range(max(iters // pipeline, 1)):
        pending = []
        t0 = time.perf_counter()
        for _ in range(pipeline):
            p, s = chained(p, curr)
            pending.append(s)
        for s in pending:
            np.asarray(s)
        times.append(time.perf_counter() - t0)
    times.sort()
    return items_per_call * pipeline / times[len(times) // 2]
