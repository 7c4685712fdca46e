"""Sweep the frames-kernel batching knobs on the current device.

Measures steady-state throughput of ``phase_correlate_frames_pallas`` for
combinations of ``band_stack`` (bands sharing one matmul stream) and
``pairs_per_step`` (frame pairs per grid step), with a data-dependent chain
so dispatch pipelining cannot elide work (see .claude/skills/verify/SKILL.md).

Usage: python scripts/tune_frames_kernel.py [BATCH] [ITERS]
"""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "560")))

import jax
import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.ops.pallas_kernels import phase_correlate_frames_pallas
from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def measure(band_stack: int, pairs_per_step: int) -> float:
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)
    curr = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)

    @jax.jit
    def chained(prev, curr):
        sh, mv = phase_correlate_frames_pallas(
            curr, prev, patch=120, exact_inputs=True,
            band_stack=band_stack, pairs_per_step=pairs_per_step,
        )
        bump = (jnp.nan_to_num(jnp.sum(mv)) % 3.0 + 1.0).astype(prev.dtype)
        return prev + bump, sh

    p, s = chained(prev, curr)
    np.asarray(s)
    for _ in range(2):
        p, s = chained(p, curr)
        np.asarray(s)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        p, s = chained(p, curr)
        np.asarray(s)
        times.append(time.perf_counter() - t0)
    times.sort()
    return BATCH / times[len(times) // 2]


def main():
    print(f"backend={jax.default_backend()} batch={BATCH}")
    for m in (1, 2, 4):
        for stack in (1, 2, 4):
            if stack > 4 * m:
                continue
            try:
                fps = measure(stack, m)
                print(f"pairs_per_step={m} band_stack={stack}: {fps:,.0f} fps", flush=True)
            except Exception as e:
                print(f"pairs_per_step={m} band_stack={stack}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
