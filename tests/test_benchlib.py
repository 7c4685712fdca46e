"""Smoke coverage for the shared benchmark harness (``utils/benchlib``).

These are correctness tests, not measurements: tiny geometry on the CPU
backend, asserting the harness runs end to end and returns finite,
well-formed numbers.  The measurement-honesty properties themselves (RPC
dedupe resistance, host materialization) only matter — and are only
observable — on the real tunnelled TPU link (docs/PERFORMANCE.md rules 5-9).
"""

import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.models import FftMethodConfig
from mrs_optic_flow_tpu.utils.benchlib import (
    make_chained,
    measure_chained,
    measure_device_chain_latency,
    measure_node_latency,
)


def test_make_chained_preserves_dtype_and_forces_dependence():
    calls = []

    def step(prev, curr):
        calls.append(1)
        return prev.astype(jnp.float32).sum(), jnp.float32(1.0)

    chained = make_chained(step)
    prev = jnp.zeros((4, 4), jnp.uint8)
    curr = jnp.ones((4, 4), jnp.uint8)
    nxt, _ = chained(prev, curr)
    assert nxt.dtype == jnp.uint8
    # bump is 1..3, so the chained input genuinely changes every call
    nxt2, _ = chained(nxt, curr)
    assert int(jnp.sum(nxt2)) > int(jnp.sum(nxt)) > 0


def test_measure_chained_returns_positive_rate():
    def step(prev, curr):
        s = (prev.astype(jnp.float32) * curr.astype(jnp.float32)).sum()
        return s, s

    chained = make_chained(step)
    prev = jnp.ones((8, 8), jnp.float32)
    curr = jnp.ones((8, 8), jnp.float32)
    rate = measure_chained(
        chained, prev, curr, items_per_call=8, iters=4, pipeline=2, warmup=1
    )
    assert np.isfinite(rate) and rate > 0


def test_device_chain_latency_tiny_geometry():
    # 48 px frames / 12 px patches: the full fused chain (grayscale -> crop
    # -> flow -> getRT -> detilt) in a dynamic-trip-count while_loop, both
    # chain lengths through ONE compiled program
    cfg = FftMethodConfig(frame_size=48, sample_point_size=12, mxu_passes=1)
    out = measure_device_chain_latency(
        16, reps=2, warmup=1, config=cfg, width=64, height=48
    )
    assert out["k"] == 16
    assert np.isfinite(out["per_frame_ms"])


def test_node_latency_smoke():
    # a handful of frames through the real node path; just assert the
    # percentile record is well-formed (values are meaningless on CPU)
    out = measure_node_latency(
        n_frames=4,
        warmup=2,
        n_distinct=2,
        overrides={
            "mrs_optic_flow": {"frame_size": 96, "sample_point_size": 24},
        },
    )
    assert out["n"] == 4
    for key in ("p50_ms", "p90_ms", "p95_ms", "p99_ms", "mean_ms"):
        assert np.isfinite(out[key]) and out[key] > 0
    assert out["p50_ms"] <= out["p99_ms"]
