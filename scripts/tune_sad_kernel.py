"""Perf-qualify the SAD engines (methods 3 / 5) on real TPU.

Measures the ``lax.scan`` SAD search vs the fused Pallas kernel
(``ops/block_matching.py::sad_search`` / ``sad_search_pallas``) through the
full engine step (block extraction -> SAD -> vote -> refine) at the
reference-default geometry — BlockMethod: 120 px blocks / 21 px radius
(``src/BlockMethod.cpp:25-57``), FastSpacedBM: the spaced grid of
``src/FastSpacedBMMethod.cl:4-84`` — so the ``use_pallas`` defaults in
``models/block_method.py`` / ``models/fast_spaced_bm.py`` are set from a
published measurement (docs/PERFORMANCE.md), not guessed.

Methodology (docs/PERFORMANCE.md rules 5-7 and
``benchlib.measure_scan_slope``): two ``lax.scan`` chain lengths with a
per-rep scalar bias (every dispatch value-distinct — nothing dedupable),
per-frame time = the slope between the two, so per-dispatch link overhead
cancels exactly.

Usage: python scripts/tune_sad_kernel.py   (prints one JSON line per config)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_guard import clear_axon_env, install_alarm

clear_axon_env()
install_alarm(560)

import numpy as np


def measure_engine_scan(engine, k=256, reps=9, warmup=2):
    """Per-frame ms of ``engine.step``: slope between a k/4- and a k-frame
    ``lax.scan`` chain (``measure_scan_slope`` — link RTT cancels; a per-rep
    bias keeps every dispatch value-distinct)."""
    import jax
    import jax.numpy as jnp

    from mrs_optic_flow_tpu.utils.benchlib import measure_scan_slope

    @jax.jit
    def chain(state, frames, bias):
        def body(st, frame):
            st, res = engine.step(st, frame + bias)
            return st, (jnp.nansum(res.shifts), jnp.sum(res.response))

        st, outs = jax.lax.scan(body, state, frames)
        return st, jnp.sum(outs[0]) + jnp.sum(outs[1])

    def build(kk):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, size=(480, 480)).astype(np.float32)
        frames = jnp.asarray(
            np.stack([np.roll(base, 3 * i, axis=0) for i in range(kk)])
        )
        holder = {"state": engine.init_state()}

        def run(i):
            st, chk = chain(holder["state"], frames, jnp.float32(i) * 1e-2)
            float(chk)  # host materialization — the only guaranteed wait
            holder["state"] = st

        return run

    return measure_scan_slope(build, (k // 4, k), reps=reps, warmup=warmup)[
        "per_item_ms"
    ]


def main():
    import jax

    from mrs_optic_flow_tpu.models import (
        BlockMethod,
        BlockMethodConfig,
        FastSpacedBM,
        FastSpacedBMConfig,
    )
    from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    backend = jax.default_backend()
    for name, ctor, cfg_ctor in (
        ("block_method", BlockMethod, BlockMethodConfig),
        ("fast_spaced_bm", FastSpacedBM, FastSpacedBMConfig),
    ):
        row = {"metric": f"sad_{name}_ms_per_frame", "unit": "ms",
               "backend": backend}
        for use_pallas in (False, True):
            eng = ctor(cfg_ctor(use_pallas=use_pallas))
            ms = measure_engine_scan(eng)
            row["pallas" if use_pallas else "scan"] = round(ms, 4)
        row["winner"] = "pallas" if row["pallas"] < row["scan"] else "scan"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
