"""Headline benchmark: multi-point FFT flow throughput on 752x480 frames.

Measures the reference's hot path end-to-end on device — grayscale-equivalent
480x480 crop, 4x4 grid of 120 px patches, phase correlation + peak + centroid
+ validity gating — in steady-state batched mode using the fully-fused Pallas
kernel.  Default is the documented fast mode (single bf16 MXU pass per
matmul, 0.02 px flow error — 5x under the 0.1 px budget; set
BENCH_MXU_PASSES=3 for the 0.0005 px production-default kernels at ~73%
of the throughput).  Honesty measures live in
``mrs_optic_flow_tpu.utils.benchlib`` (shared with the tuning scripts):

- a data-dependent chain links every iteration (dispatch pipelining / RPC
  dedupe cannot elide work; see .claude/skills/verify/SKILL.md);
- results are read back to the host with a bounded pipeline depth of
  PIPELINE batches in flight (a streaming consumer's shape); every batch's
  shifts are materialized on the host.

Prints ONE JSON line:
  {"metric": "flow_frame_pairs_per_sec", "value": N, "unit": "fps",
   "vs_baseline": N / 2000}
(baseline: BASELINE.md target of 2,000 frame-pairs/sec/chip.)
"""

import json
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fail fast instead of hanging the driver if the device link is wedged
signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "540")))

# prefer the real TPU when the axon sitecustomize is active; JAX_PLATFORMS
# from the sandbox env ("axon") is fine as-is
import jax
import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig
from mrs_optic_flow_tpu.utils.benchlib import make_chained, measure_chained

BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
ITERS = int(os.environ.get("BENCH_ITERS", "16"))
PIPELINE = int(os.environ.get("BENCH_PIPELINE", "8"))
BASELINE_FPS = 2000.0


def main():
    on_tpu = jax.default_backend() == "tpu"
    # BENCH_MXU_PASSES selects the MXU pass count (docs/PERFORMANCE.md):
    # 1 (default here) = fast mode at 0.02 px error, 3 = the engine's
    # 0.0005 px default
    passes = int(os.environ.get("BENCH_MXU_PASSES", "1"))
    engine = FftMethod(
        FftMethodConfig(backend="dft", use_pallas=on_tpu, mxu_passes=passes)
    )

    rng = np.random.default_rng(0)
    # 752x480 capture -> 480x480 crop happens upstream; the flow engine's
    # input contract is the cropped frame (the crop is a view; the transfer
    # below is the full cropped frame per pair member).  Frames are uint8 —
    # the camera contract (CV_8U capture, src/optic_flow.cpp:1465): 4x fewer
    # transfer bytes, streamed into the kernel uncast (no f32 HBM copy), and
    # 8-bit-exact inputs drop the low-order bf16 split pass (bit-identical
    # results; docs/PERFORMANCE.md)
    prev = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)
    curr = jnp.asarray(rng.integers(0, 255, size=(BATCH, 480, 480)), jnp.uint8)

    def step(prev, curr):
        res = engine.step_batch(prev, curr)
        return res.shifts, jnp.sum(res.response)

    chained = make_chained(step)
    fps = measure_chained(
        chained, prev, curr, items_per_call=BATCH, iters=ITERS, pipeline=PIPELINE
    )
    print(
        json.dumps(
            {
                "metric": "flow_frame_pairs_per_sec",
                "value": round(fps, 1),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
