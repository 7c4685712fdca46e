"""Profiling / tracing — the ``mrs_lib::Profiler`` + ``Routine`` equivalent.

The reference wraps every callback and timer in a RAII Routine
(``src/optic_flow.cpp:1075``, ``:1107``, ``:1258``, ``:1435``, ...), toggled
by ``enable_profiler``.  Here: a context-manager Routine collecting per-stage
wall-time statistics (count / mean / p50 / p95 / max), an optional JSON-lines
event log, and throttled logging helpers (the ``ROS_*_THROTTLE`` idiom).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class Profiler:
    def __init__(self, name: str = "OpticFlow", enabled: bool = True,
                 event_log_path: Optional[str] = None,
                 jax_trace_dir: Optional[str] = None):
        """``jax_trace_dir`` enables device-level tracing: routines run under
        ``jax.profiler.TraceAnnotation`` and :meth:`start_device_trace` /
        :meth:`stop_device_trace` capture a TensorBoard-compatible profile —
        the device-side visibility the reference only had as commented-out
        ``std::clock`` scaffolding (``src/FftMethod.cpp:1399-1411``)."""
        self.name = name
        self.enabled = enabled
        self.jax_trace_dir = jax_trace_dir
        self._samples: Dict[str, list] = defaultdict(list)
        self._event_log = open(event_log_path, "a") if event_log_path else None

    def start_device_trace(self):
        import jax

        jax.profiler.start_trace(self.jax_trace_dir or "/tmp/of_jax_trace")

    def stop_device_trace(self):
        import jax

        jax.profiler.stop_trace()

    @contextlib.contextmanager
    def routine(self, routine_name: str):
        """``profiler_->createRoutine(name)`` as a context manager."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        ctx = None
        if self.jax_trace_dir is not None:
            import jax

            ctx = jax.profiler.TraceAnnotation(routine_name)
            ctx.__enter__()
        try:
            yield
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
            dt = time.perf_counter() - t0
            self._samples[routine_name].append(dt)
            if self._event_log is not None:
                self._event_log.write(
                    json.dumps({"t": time.time(), "routine": routine_name, "dur_s": dt})
                    + "\n"
                )
                # post-mortem value requires the tail to survive a crash —
                # don't let the last events sit in the stdio buffer
                self._event_log.flush()

    def stats(self) -> Dict[str, dict]:
        out = {}
        for k, v in self._samples.items():
            s = sorted(v)
            n = len(s)
            out[k] = {
                "count": n,
                "mean_s": sum(s) / n,
                "p50_s": s[n // 2],
                "p95_s": s[min(n - 1, int(n * 0.95))],
                "max_s": s[-1],
            }
        return out

    def report(self) -> str:
        lines = [f"[{self.name}] profiler report"]
        for k, st in sorted(self.stats().items()):
            lines.append(
                f"  {k:28s} n={st['count']:<6d} mean={st['mean_s']*1e3:8.3f}ms "
                f"p50={st['p50_s']*1e3:8.3f}ms p95={st['p95_s']*1e3:8.3f}ms "
                f"max={st['max_s']*1e3:8.3f}ms"
            )
        return "\n".join(lines)

    def close(self):
        if self._event_log is not None:
            self._event_log.close()
            self._event_log = None


class ThrottledLog:
    """``ROS_INFO_THROTTLE``-style rate-limited logging."""

    def __init__(self, period_s: float = 1.0, sink=print):
        self.period_s = period_s
        self.sink = sink
        self._last: Dict[str, float] = {}

    def __call__(self, key: str, message: str):
        now = time.monotonic()
        if now - self._last.get(key, -1e9) >= self.period_s:
            self._last[key] = now
            self.sink(message)
