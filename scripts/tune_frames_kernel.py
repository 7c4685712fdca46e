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
install_alarm(560)

import jax
import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.ops.pallas_kernels import phase_correlate_frames_pallas
from mrs_optic_flow_tpu.utils.benchlib import make_chained, measure_chained
from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def measure(band_stack: int, pairs_per_step: int) -> float:
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)
    curr = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)

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
            try:
                fps = measure(stack, m)
                print(f"pairs_per_step={m} band_stack={stack}: {fps:,.0f} fps", flush=True)
            except Exception as e:
                print(f"pairs_per_step={m} band_stack={stack}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
