"""Sweep the frames-kernel batching knobs on the current device.

Measures steady-state throughput of ``phase_correlate_frames_pallas`` for
combinations of ``band_stack`` (bands sharing one matmul stream) and
``pairs_per_step`` (frame pairs per grid step), through the shared
honest-measurement harness (``mrs_optic_flow_tpu.utils.benchlib``: data-
dependent chain + host materialization, same as ``bench.py``).

Usage: python scripts/tune_frames_kernel.py [BATCH] [ITERS]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_guard import clear_axon_env, install_alarm

clear_axon_env()
_BUDGET_S = install_alarm(560)

import time

_T0 = time.monotonic()


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


import jax
import jax.numpy as jnp

from mrs_optic_flow_tpu.ops.pallas_kernels import phase_correlate_frames_pallas
from mrs_optic_flow_tpu.utils.benchlib import make_chained, measure_chained
from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


@jax.jit
def _make_inputs(key):
    # generated ON DEVICE: the host RNG + upload for a 2x460 MB uint8 batch
    # would dominate the alarm budget (docs/PERFORMANCE.md rule 10)
    kp, kc = jax.random.split(key)
    shape = (BATCH, 480, 480)
    return (jax.random.bits(kp, shape, jnp.uint8),
            jax.random.bits(kc, shape, jnp.uint8))


def measure(band_stack: int, pairs_per_step: int) -> float:
    prev, curr = _make_inputs(jax.random.PRNGKey(0))

    def step(prev, curr):
        sh, mv = phase_correlate_frames_pallas(
            curr, prev, patch=120, exact_inputs=True,
            band_stack=band_stack, pairs_per_step=pairs_per_step,
        )
        return sh, jnp.sum(mv)

    return measure_chained(
        make_chained(step), prev, curr, items_per_call=BATCH, iters=ITERS, warmup=2
    )


def main():
    print(f"backend={jax.default_backend()} batch={BATCH}")
    for m in (1, 2, 4):
        for stack in (1, 2, 4):
            if stack > 4 * m:
                continue
            # each config pays a fresh compile through the tunnelled link;
            # stop cleanly instead of dying in a mid-measure TimeoutError
            if _remaining() < 120:
                print(f"pairs_per_step={m} band_stack={stack}: SKIPPED (budget)")
                continue
            try:
                fps = measure(stack, m)
                print(f"pairs_per_step={m} band_stack={stack}: {fps:,.0f} fps", flush=True)
            except Exception as e:
                print(f"pairs_per_step={m} band_stack={stack}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
