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
# each measurement pays a fresh compile through the tunnel (the axon
# backend cannot persist executables); SAD_ENGINE / SAD_PATH select a
# single measurement so a driver can bound each invocation separately
install_alarm(540)

import numpy as np


def measure_engine_scan(engine, k=128, reps=7, warmup=2):
    """Per-frame ms of ``engine.step``: slope between a k/4- and a k-frame
    chain (``measure_scan_slope`` — link RTT cancels; a per-rep bias keeps
    every dispatch value-distinct).  ONE compiled program with a *dynamic*
    trip count (``lax.while_loop`` indexing a fixed frame stack) so both
    chain lengths share a single compile — the tunnelled backend cannot
    persist executables, and a scan-of-engine-step program compiled twice
    blew a 540 s budget before producing a number."""
    import jax
    import jax.numpy as jnp

    from mrs_optic_flow_tpu.utils.benchlib import measure_scan_slope

    @jax.jit
    def chain(state, frames, bias, n):
        def body(carry):
            i, st, acc = carry
            frame = jax.lax.dynamic_index_in_dim(frames, i, keepdims=False)
            st, res = engine.step(st, frame + bias)
            acc = acc + jnp.nansum(res.shifts) + jnp.sum(res.response)
            return i + 1, st, acc

        _, st, chk = jax.lax.while_loop(
            lambda c: c[0] < n, body,
            (jnp.int32(0), state, jnp.float32(0.0)),
        )
        return st, chk

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(480, 480)).astype(np.float32)
    frames = jnp.asarray(
        np.stack([np.roll(base, 3 * i, axis=0) for i in range(k)])
    )
    holder = {"state": engine.init_state()}

    def build(kk):
        def run(i):
            st, chk = chain(holder["state"], frames, jnp.float32(i) * 1e-2,
                            jnp.int32(kk))
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
    engines = {
        "block_method": (BlockMethod, BlockMethodConfig),
        "fast_spaced_bm": (FastSpacedBM, FastSpacedBMConfig),
    }
    only_engine = os.environ.get("SAD_ENGINE")
    only_path = os.environ.get("SAD_PATH")
    for name, (ctor, cfg_ctor) in engines.items():
        if only_engine and name != only_engine:
            continue
        row = {"metric": f"sad_{name}_ms_per_frame", "unit": "ms",
               "backend": backend}
        for use_pallas in (True, False):  # shipped default first
            key = "pallas" if use_pallas else "scan"
            if only_path and key != only_path:
                continue
            eng = ctor(cfg_ctor(use_pallas=use_pallas))
            ms = measure_engine_scan(eng, k=int(os.environ.get("SAD_K", "128")))
            row[key] = round(ms, 4)
            print(f"# {name} {key}: {ms:.4f} ms/frame", flush=True)
        if "pallas" in row and "scan" in row:
            row["winner"] = "pallas" if row["pallas"] < row["scan"] else "scan"
            # the shipped default (models/*.py use_pallas=True) must not be
            # the measured-slower path beyond run-to-run drift (the shared
            # pool drifts ~±10-20%; docs/PERFORMANCE.md carries the band)
            row["default_ok"] = row["pallas"] < row["scan"] * 1.1
            if not row["default_ok"]:
                print(json.dumps(row), flush=True)
                raise SystemExit(
                    f"{name}: shipped default use_pallas=True measured slower "
                    f"({row['pallas']} vs {row['scan']} ms/frame)"
                )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
