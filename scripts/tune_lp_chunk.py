"""One-off sweep: single-frame ``ScaleRotationEstimator.step`` cost vs
``lp_rows_per_chunk`` on real TPU, at the production geometry (480x480,
lanczos4).  Chases the step regression observed when the static rho trim
landed (2.41 -> 3.07 ms at rows_per_chunk=8): the trim shrinks the dense
weight temporaries per chunk, so a larger chunk may now be optimal.

Prints one JSON line per configuration (docs/PERFORMANCE.md methodology).
"""

import json
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


def main():
    import jax

    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator
    from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache
    from scripts.tune_scale_rotation import measure_step_scan

    enable_persistent_cache()
    backend = jax.default_backend()
    sweep = [int(v) for v in os.environ.get("SWEEP", "8,16,32,64").split(",")]
    for rpc in sweep:
        row = {
            "metric": f"scale_rotation_step_rpc{rpc}_ms",
            "unit": "ms",
            "backend": backend,
        }
        if _remaining() < 150:
            row["skipped"] = "budget"
            print(json.dumps(row), flush=True)
            continue
        eng = ScaleRotationEstimator(
            ScaleRotationConfig(interp="lanczos4", lp_rows_per_chunk=rpc)
        )
        row["step"] = round(measure_step_scan(eng), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
