"""Headline benchmark: multi-point FFT flow throughput on 752x480 frames.

Measures the reference's hot path end-to-end on device — grayscale-equivalent
480x480 crop, 4x4 grid of 120 px patches, phase correlation + peak + centroid
+ validity gating — in steady-state batched mode using the fully-fused Pallas
kernel.  The headline ``value`` is the SHIPPED engine default (bf16x3 MXU
passes, 0.0005 px flow error); the documented fast mode (1 pass, 0.02 px —
still 5x under the 0.1 px budget) is reported alongside as ``value_fast``.
Set BENCH_MXU_PASSES to pin a single mode.  Per-frame latency percentiles
(see ``bench_latency.py`` for the full artifact) are appended as
``latency_*`` fields unless BENCH_LATENCY=0; an on-chip ACCURACY stage
(compiled kernels vs the f64 oracle on known-shift uint8 pairs — the
reference's dual-backend conformance axis, ``src/FftMethod.cpp:1824-1836``)
emits ``accuracy_px``/``accuracy_px_fast`` against the 0.1 px budget unless
BENCH_ACCURACY=0.  Throughput fields carry their per-window spread
(``value_windows``/``value_min``/``value_max``); the device-latency slope
is jitter-aware and self-escalating (``benchlib.measure_scan_slope``), and
ratios are never published off an unreliable slope.  Honesty measures live
in ``mrs_optic_flow_tpu.utils.benchlib`` (shared with the tuning scripts):

- a data-dependent chain links every iteration (dispatch pipelining / RPC
  dedupe cannot elide work; see .claude/skills/verify/SKILL.md);
- results are read back to the host with a bounded pipeline depth of
  PIPELINE batches in flight (a streaming consumer's shape); every batch's
  shifts are materialized on the host.

Wedge resilience (the round-3 lesson: one stuck device pool erased the
round's entire hardware evidence):

- a PRE-FLIGHT LINK PROBE (tiny matmul + host readback in a child process
  under its own alarm) detects a wedged pool in seconds and names it in the
  JSON instead of burning the whole budget hanging, with a bounded
  backoff-and-retry loop inside the alarm budget (``bench_guard``);
- INCREMENTAL EMISSION: every milestone prints the full current record as a
  flushed JSON line (``"provisional": true`` until the final one), so a
  late wedge can never erase an early measurement — consumers take the
  last line on stdout.

The final line is the complete record:
  {"metric": "flow_frame_pairs_per_sec", "value": N, "unit": "fps",
   "vs_baseline": N / 2000, ...}
(baseline: BASELINE.md target of 2,000 frame-pairs/sec/chip.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fail fast instead of hanging the driver if the device link is wedged —
# with a raising handler so partial results still print as the JSON line
from bench_guard import Emitter, budget_clock, install_alarm, probe_link_with_retry

#: seconds left before the alarm fires (shared helper — bench_guard)
_remaining = budget_clock(install_alarm(540))

# prefer the real TPU when the axon sitecustomize is active; JAX_PLATFORMS
# from the sandbox env ("axon") is fine as-is
import jax
import jax.numpy as jnp
import numpy as np

from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig
from mrs_optic_flow_tpu.utils.benchlib import make_chained, measure_chained_stats

BATCH = int(os.environ.get("BENCH_BATCH", "4096"))
# 32 iters at the default 8-deep pipeline = 4 timed windows: the published
# headline gets a spread, not a median-of-2 (VERDICT r4 weak 2)
ITERS = int(os.environ.get("BENCH_ITERS", "32"))
PIPELINE = int(os.environ.get("BENCH_PIPELINE", "8"))
BASELINE_FPS = 2000.0
ACCURACY_BUDGET_PX = 0.1  # BASELINE.md flow-accuracy target


def _measure_fps(passes: int, prev, curr, progress=None) -> dict:
    """Steady-state throughput stats (p50/min/max over the timed windows)."""
    on_tpu = jax.default_backend() == "tpu"
    engine = FftMethod(
        FftMethodConfig(backend="dft", use_pallas=on_tpu, mxu_passes=passes)
    )

    def step(prev, curr):
        res = engine.step_batch(prev, curr)
        # materialize a CHECKSUM of the shifts, not the [B, P, 2] tensor:
        # the data dependence still forces full execution, but reading
        # 512 KB/window through this sandbox's ~20 MB/s link would measure
        # the link, not the chip (on-host the same readback is PCIe-cheap)
        chk = jnp.nansum(res.shifts, axis=(1, 2))  # [B]
        return chk, jnp.sum(res.response)

    chained = make_chained(step)
    return measure_chained_stats(
        chained, prev, curr, items_per_call=BATCH, iters=ITERS,
        pipeline=PIPELINE, progress=progress,
    )


def _measure_accuracy(modes, n_pairs: int = 6) -> dict:
    """Sub-pixel flow error of the COMPILED kernels on THIS backend vs the
    f64 numpy oracle — correctness evidence on the real chip inside the
    driver artifact (the reference's dual-backend conformance axis,
    ``src/FftMethod.cpp:1824-1836``; until round 5 it was proven on
    hardware only by builder-run scripts).  ``modes``: (field_name,
    mxu_passes) pairs.  Pair synthesis + oracle answers come from the ONE
    shared definition (``tests/oracle.py::make_accuracy_pairs``) so this
    number and the builder table (``scripts/accuracy_report.py``) can
    never drift apart.  A mode that NaNs any window (the shifts are clean
    textures well inside every validity gate — a NaN means the compiled
    kernel broke) reports ``<field>_nan_windows``, which fails the budget
    check: ``nanmax`` alone would silently ignore a regression that
    invalidity-gates windows instead of mis-locating peaks."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )
    from oracle import make_accuracy_pairs

    size, patch = 480, 120
    prev, curr, _truth, osh = make_accuracy_pairs(
        np.random.default_rng(42), n_pairs, size=size, patch=patch
    )
    on_tpu = jax.default_backend() == "tpu"
    pj, cj = jnp.asarray(prev), jnp.asarray(curr)
    out = {}
    for field, passes in modes:
        eng = FftMethod(FftMethodConfig(
            frame_size=size, sample_point_size=patch,
            backend="dft", use_pallas=on_tpu, mxu_passes=passes,
        ))
        s = np.asarray(eng.step_batch(pj, cj).shifts)
        err = np.abs(s - osh)
        # null (strict JSON) rather than NaN when EVERY window NaN'd —
        # json.dumps would otherwise emit a bare NaN token, making the
        # record documenting the regression itself unparseable to strict
        # consumers; main() treats None as a budget failure
        out[field] = (None if np.isnan(err).all()
                      else round(float(np.nanmax(err)), 5))
        nans = int(np.isnan(s).any(axis=-1).sum())
        if nans:
            out[f"{field}_nan_windows"] = nans
    return out


def main():
    # BENCH_MXU_PASSES pins one MXU pass count (docs/PERFORMANCE.md);
    # unset, the headline is the shipped engine default (3 = 0.0005 px) with
    # the fast mode (1 = 0.02 px) measured alongside
    pinned = os.environ.get("BENCH_MXU_PASSES")
    passes = int(pinned) if pinned else 3

    em = Emitter({
        "metric": "flow_frame_pairs_per_sec",
        "unit": "fps",
        "mxu_passes": passes,
    })

    # ---- pre-flight link probe (BENCH_PROBE=0 skips, e.g. CPU runs) ----
    # A wedged pool hangs every device touch including backend init; the
    # probe detects that in a child process in seconds, names it in the
    # JSON, and retries after backoff inside the alarm budget instead of
    # silently burning the whole budget (the BENCH_r03 failure mode).
    if os.environ.get("BENCH_PROBE", "1") != "0":
        if not probe_link_with_retry(em, _remaining):
            em.emit(final=True)  # carries the last probe failure
            raise SystemExit(1)

    # 752x480 capture -> 480x480 crop happens upstream; the flow engine's
    # input contract is the cropped frame.  Frames are uint8 — the camera
    # contract (CV_8U capture, src/optic_flow.cpp:1465): streamed into the
    # kernel uncast (no f32 HBM copy), and 8-bit-exact inputs drop the
    # low-order bf16 split pass (bit-identical results; docs/PERFORMANCE.md).
    # Generated ON DEVICE (jax.random.bits): this sandbox has one weak vCPU
    # (~6 Mvalue/s numpy RNG — the 2x944 MB batch would take ~5 min to
    # synthesize) and a slow tunnelled link (the upload would take minutes
    # more); neither cost belongs in a device-throughput benchmark.
    @jax.jit
    def _make_inputs(key):
        kp, kc = jax.random.split(key)
        shape = (BATCH, 480, 480)
        return (jax.random.bits(kp, shape, jnp.uint8),
                jax.random.bits(kc, shape, jnp.uint8))

    try:
        # first device touch in THIS process: a wedge that develops after
        # the probe hangs here — name the phase so an infra failure can't
        # be mistaken for a perf regression
        prev, curr = _make_inputs(jax.random.PRNGKey(0))
        em.update(backend=jax.default_backend())
    except Exception as e:  # noqa: BLE001 — init must report, whatever broke
        em.emit(final=True, error=f"device init failed: {type(e).__name__}: {e}")
        raise SystemExit(1)
    try:
        # the first timed window's rate is emitted immediately (provisional)
        # — a wedge during refinement can no longer erase the measurement
        st = _measure_fps(
            passes, prev, curr,
            progress=lambda r: em.emit(
                value=round(r, 1), vs_baseline=round(r / BASELINE_FPS, 3)
            ),
        )
        em.update(
            value=round(st["rate"], 1),
            vs_baseline=round(st["rate"] / BASELINE_FPS, 3),
            # per-window spread: pool-load drift vs regression becomes
            # adjudicable from the artifact alone (VERDICT r4 weak 2/3)
            value_windows=[round(r, 1) for r in st["window_rates"]],
            value_min=round(st["rate_min"], 1),
            value_max=round(st["rate_max"], 1),
        )
        em.emit()
    except TimeoutError as e:
        em.emit(final=True, error=str(e))
        raise SystemExit(1)
    except Exception as e:  # noqa: BLE001 — the JSON-line contract holds
        # for every phase: a transient runtime/RPC failure mid-headline
        # must still print a parseable record naming the failing phase
        em.emit(final=True, error=f"headline failed: {type(e).__name__}: {e}")
        raise SystemExit(1)
    # the optional sections each pay fresh compiles (the tunnelled axon
    # backend cannot persist executables — utils/cache.py), so gate them on
    # the time actually left before the alarm: a partial JSON line with a
    # skip note beats a TimeoutError error line
    if not pinned:
        if _remaining() > 90:
            try:
                fast = _measure_fps(1, prev, curr)
                em.emit(
                    value_fast=round(fast["rate"], 1),
                    value_fast_windows=[round(r, 1)
                                        for r in fast["window_rates"]],
                    value_fast_min=round(fast["rate_min"], 1),
                    value_fast_max=round(fast["rate_max"], 1),
                )
            except TimeoutError as e:
                # the alarm fires ONCE — swallowing it here would leave the
                # rest of the run unprotected against a wedged device link
                em.emit(final=True, value_fast_error=str(e))
                raise SystemExit(1)
            except Exception as e:  # noqa: BLE001 — headline must still print
                em.update(value_fast_error=f"{type(e).__name__}: {e}")
        else:
            em.update(value_fast_skipped="budget")
    # ---- accuracy on THIS chip (BENCH_ACCURACY=0 skips) ----
    # compiled-Mosaic-vs-oracle parity in the driver artifact: interpret-
    # mode CI cannot catch a compiled-kernel regression (VERDICT r4
    # missing 2).  Reserve enough budget for the latency stage below.
    if os.environ.get("BENCH_ACCURACY", "1") == "0":
        pass
    elif _remaining() > 300:
        try:
            modes = [("accuracy_px", passes)]
            if not pinned:
                modes.append(("accuracy_px_fast", 1))
            acc = _measure_accuracy(modes)
            # every error under budget AND zero NaN'd windows (a compiled
            # regression may invalidity-gate windows instead of
            # mis-locating peaks; nanmax alone would wave that through)
            ok = all(v is not None and v < ACCURACY_BUDGET_PX
                     for k_, v in acc.items()
                     if not k_.endswith("_nan_windows"))
            ok = ok and not any(k_.endswith("_nan_windows") for k_ in acc)
            em.emit(**acc, accuracy_budget_px=ACCURACY_BUDGET_PX,
                    accuracy_ok=ok)
            if not ok:
                em.update(accuracy_error="flow error exceeds the 0.1 px "
                                         "budget (or windows NaN'd) on "
                                         "this backend")
        except TimeoutError as e:
            em.emit(final=True, accuracy_error=str(e))
            raise SystemExit(1)
        except Exception as e:  # noqa: BLE001 — headline must still print
            em.update(accuracy_error=f"{type(e).__name__}: {e}")
    else:
        em.update(accuracy_skipped="budget")
    if os.environ.get("BENCH_LATENCY", "1") != "0" and _remaining() < 210:
        em.update(latency_skipped="budget")
    elif os.environ.get("BENCH_LATENCY", "1") != "0":
        try:
            from mrs_optic_flow_tpu.utils.benchlib import (
                measure_device_chain_latency,
                measure_node_latency,
                measure_node_latency_ab,
            )

            # jitter-aware + self-escalating (chain doubles, up to 4x, when
            # the median separation does not clear the rep jitter —
            # BENCH_r04's 0.0655 ms/frame artifact; docs/PERFORMANCE.md
            # rule 8); keep 120 s of alarm budget for the e2e stages
            dev = measure_device_chain_latency(
                int(os.environ.get("BENCH_LATENCY_K", "100")),
                budget_s=lambda: _remaining() - 120,
            )
            lat_fields = dict(
                latency_device_ms=round(dev["per_frame_ms"], 4),
                # raw chain medians + the jitter scale: a corrupted slope
                # is self-evident AND machine-checked (benchlib)
                latency_chain_medians_ms={
                    k_: round(v, 2)
                    for k_, v in dev["chain_medians_ms"].items()
                },
                latency_delta_ms=round(dev["delta_ms"], 2),
                latency_jitter_ms=round(dev["jitter_ms"], 2),
                latency_chain_k=dev["k"],
                latency_escalations=dev["escalations"],
            )
            if dev["slope_ok"]:
                # BASELINE.md's second target (<= 2 ms device-side per-frame
                # chain) re-proven per round, as a ratio like vs_baseline:
                # >1 = under target by that factor
                lat_fields["latency_vs_target"] = round(
                    2.0 / max(dev["per_frame_ms"], 1e-9), 2
                )
            else:
                # the chain-median delta never cleared the jitter band even
                # at the escalated length: the slope is link noise, and no
                # ratio may be built on it
                lat_fields["latency_slope_unreliable"] = True
            em.emit(**lat_fields)
            # 300 frames keeps the driver bench inside its timeout; the full
            # >=1000-frame artifact lives in bench_latency.py
            e2e = measure_node_latency(
                int(os.environ.get("BENCH_LATENCY_FRAMES", "300"))
            )
            em.emit(
                latency_p50_ms=round(e2e["p50_ms"], 3),
                latency_p99_ms=round(e2e["p99_ms"], 3),
            )
            if _remaining() > 150:
                # tpu.host_preprocess (native fused gray+crop, 4.7x fewer
                # upload bytes): INTERLEAVED A/B — block-alternating the
                # knob within one run cancels the link drift that made
                # sequential captures flip-flop (docs/PERFORMANCE.md)
                ab = measure_node_latency_ab(
                    int(os.environ.get("BENCH_LATENCY_FRAMES", "300")),
                    overrides_b={"tpu": {"host_preprocess": True}},
                )
                em.update(
                    latency_p50_hostpre_ms=round(ab["b_p50_ms"], 3),
                    # negative = host_preprocess wins
                    latency_hostpre_delta_ms=round(ab["delta_p50_ms"], 3),
                    latency_hostpre_sign_consistency=round(
                        ab["sign_consistency"], 2
                    ),
                )
            else:
                em.update(latency_hostpre_skipped="budget")
        except TimeoutError as e:  # see above — never swallow the one alarm
            em.emit(final=True, latency_error=str(e))
            raise SystemExit(1)
        except Exception as e:  # noqa: BLE001 — headline must still print
            em.update(latency_error=f"{type(e).__name__}: {e}")
    em.emit(final=True)


if __name__ == "__main__":
    main()
