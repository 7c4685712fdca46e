"""Process guards shared by every TPU-touching entry script.

One definition of the wedge-avoidance recipe (see
``.claude/skills/verify/SKILL.md``), so a revision cannot silently miss one
of the six entry scripts (``bench.py``, ``bench_latency.py``,
``scripts/tpu_smoke.py``, ``scripts/tune_*.py``):

- a *raising* SIGALRM handler — the default disposition is a process kill,
  and a client killed while holding/waiting on the device-pool claim wedges
  the pool for every later process;
- optional clearing of the sandbox's ``JAX_PLATFORMS=axon`` pin, which
  plain scripts cannot resolve (auto-pick still finds the TPU through the
  registered plugin).

This module must stay importable BEFORE jax (no jax imports here): the
alarm has to be armed before the first device touch, and clearing the env
only works before ``import jax``.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import tempfile
import time


def _timeout(signum, frame):
    raise TimeoutError("BENCH_TIMEOUT_S exceeded")


def install_alarm(default_s: int = 540) -> int:
    """Arm a raising ``SIGALRM`` with the ``BENCH_TIMEOUT_S`` budget
    (defaulting to ``default_s``); returns the budget in seconds."""
    signal.signal(signal.SIGALRM, _timeout)
    budget = int(os.environ.get("BENCH_TIMEOUT_S", str(default_s)))
    signal.alarm(budget)
    return budget


def budget_clock(budget_s: int):
    """Zero-arg callable returning seconds left of a ``budget_s`` window
    starting NOW — the ``remaining()`` companion to :func:`install_alarm`,
    shared by the entry scripts instead of each keeping its own copy."""
    t0 = time.monotonic()

    def remaining() -> float:
        return budget_s - (time.monotonic() - t0)

    return remaining


def clear_axon_env() -> None:
    """Clear exactly the sandbox's ``JAX_PLATFORMS=axon`` pin (preserving
    deliberate overrides like ``"cpu"``) so jax's auto-pick resolves the
    TPU through the registered plugin."""
    if os.environ.get("JAX_PLATFORMS") == "axon":
        os.environ["JAX_PLATFORMS"] = ""


class Emitter:
    """Incremental one-JSON-line benchmark record.

    Round 3's whole hardware evidence was erased by a single device-pool
    wedge because the benchmark was all-or-nothing: one record printed at
    the very end, nothing if any phase hung.  This emitter inverts that:
    every ``emit()`` prints the FULL current record as one flushed JSON
    line, so however the process dies afterwards (alarm, wedge, driver
    kill), the LAST complete line on stdout is the best measurement so
    far.  Non-final emissions carry ``"provisional": true``; the final one
    drops the flag.  Consumers that take the last JSON line (or the only
    one, when nothing interrupts the run) see a parseable record either
    way.
    """

    def __init__(self, record: dict | None = None, stream=None):
        self.record = dict(record or {})
        self.stream = stream if stream is not None else sys.stdout

    def update(self, **fields) -> None:
        self.record.update(fields)

    def emit(self, final: bool = False, **fields) -> None:
        self.record.update(fields)
        rec = dict(self.record)
        if final:
            rec.pop("provisional", None)
        else:
            rec["provisional"] = True
        print(json.dumps(rec), file=self.stream, flush=True)


#: the probe child: a tiny matmul + HOST READBACK (the only wait that truly
#: covers execution through the tunnelled backend) under its own raising
#: alarm, so it always exits cleanly and releases its pool claim.  Run as a
#: SUBPROCESS: the pool claim is per-process, and a wedge detected here
#: leaves the parent's own (not-yet-created) client untouched.
_PROBE_SOURCE = """
import os, signal, sys, time
def _h(signum, frame):
    print("PROBE_TIMEOUT", flush=True)
    raise SystemExit(3)
signal.signal(signal.SIGALRM, _h)
signal.alarm(int(os.environ.get("PROBE_BUDGET_S", "90")))
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
v = float(x[0, 0])
print("PROBE_OK value=%s backend=%s total=%.1fs"
      % (v, jax.default_backend(), time.time() - t0), flush=True)
sys.exit(0)
"""


#: abandoned probe children still waiting on the pool claim: (Popen, log
#: path).  Killing them would wedge the pool (verify SKILL.md), so they are
#: tracked and reaped — log file unlinked — once they exit on their own.
_abandoned_probes: list = []


def _reap_abandoned() -> int:
    """Reap abandoned probe children that have since exited (unlink their
    log files); returns how many are STILL alive."""
    alive = []
    for proc, log_path in _abandoned_probes:
        if proc.poll() is None:
            alive.append((proc, log_path))
        else:
            try:
                os.unlink(log_path)
            except OSError:
                pass
    _abandoned_probes[:] = alive
    return len(alive)


def probe_link(budget_s: int = 120, *, wait_slack_s: int = 25,
               _argv=None) -> tuple:
    """Pre-flight device-link health probe in a child process.

    Returns ``(status, detail)`` with status one of:

    - ``"ok"`` — matmul + readback completed; the pool is healthy;
    - ``"timeout"`` — the child's alarm fired (pool wedged / claim stuck);
    - ``"abandoned"`` — the child did not exit even past its alarm (SIGALRM
      delivery can be deferred while blocked inside an init RPC).  The
      child is LEFT RUNNING — killing a TPU client mid-claim is exactly
      what wedges the pool for every later process (verify SKILL.md) — and
      it exits on its own when the signal finally lands;
    - ``"error"`` — the child failed some other way (import error, ...).

    ``_argv`` overrides the child command line (tests substitute a stub).
    """
    import subprocess

    env = dict(os.environ, PROBE_BUDGET_S=str(int(budget_s)))
    argv = _argv or [sys.executable, "-c", _PROBE_SOURCE]
    # stdout to a real file, not a pipe: an abandoned child writing to a
    # closed pipe would die of SIGPIPE mid-RPC — itself a wedge risk
    with tempfile.NamedTemporaryFile(
        mode="w+", suffix=".probe.log", delete=False
    ) as logf:
        proc = subprocess.Popen(
            argv, env=env, stdout=logf, stderr=subprocess.STDOUT
        )
        try:
            rc = proc.wait(timeout=budget_s + wait_slack_s)
        except subprocess.TimeoutExpired:
            # the abandoned child still owns the log file — leave it, but
            # TRACK it so the retry loop can avoid stacking a second
            # claim-waiter on top (overlapping waiters extend a wedge) and
            # can reap the log once the child exits
            _abandoned_probes.append((proc, logf.name))
            return "abandoned", (
                "probe stuck past its internal alarm (pool wedged; "
                "child left running to exit cleanly on its own)"
            )
        logf.seek(0)
        tail = logf.read().strip().splitlines()
    os.unlink(logf.name)  # child exited; don't leak one log per attempt
    last = tail[-1] if tail else ""
    if rc == 0:
        return "ok", last
    if rc == 3:
        return "timeout", "pool wedged (probe timeout)"
    return "error", f"probe rc={rc}: {last[-300:]}"


def probe_link_with_retry(
    emitter: "Emitter",
    remaining_s,
    *,
    budget_s: int = 120,
    backoff_s: int = 75,
    reserve_s: int = 60,
    sleep=time.sleep,
    _probe=None,
) -> bool:
    """Bounded probe → backoff → retry loop in front of the measurement.

    ``remaining_s``: zero-arg callable returning seconds left in the outer
    alarm budget.  Each failed attempt is emitted as a provisional record
    naming the failure (so even a never-recovering pool leaves parseable
    evidence), then the loop backs off — a killed/hammered claim-wait can
    EXTEND a wedge — and retries while enough budget remains for another
    attempt plus ``reserve_s`` to report.  Two failure modes cut the loop
    short: a DETERMINISTIC child failure (``status == "error"``, e.g. an
    import/plugin break that no amount of backoff repairs) retries at most
    once; and after an "abandoned" attempt the next probe is deferred
    until the stuck child has actually exited (overlapping claim-waiters
    can extend a wedge — verify SKILL.md), its log reaped once it does.
    Returns True once a probe passes; False when the budget is exhausted
    (the caller should emit the final error record and exit nonzero)."""
    probe = _probe or probe_link
    # driver-tunable without code changes (the child reads PROBE_BUDGET_S;
    # this is the parent's per-attempt allowance)
    budget_s = int(os.environ.get("BENCH_PROBE_BUDGET_S", budget_s))
    attempt = errors = 0
    while True:
        attempt += 1
        left = remaining_s()
        if attempt > 1 and left < budget_s + reserve_s:
            return False
        status, detail = probe(min(budget_s, max(int(left - reserve_s), 30)))
        if status == "ok":
            # a recovered pool clears the earlier attempts' error field —
            # the final record must not carry a stale failure
            emitter.record.pop("error", None)
            emitter.update(probe=detail, probe_attempts=attempt)
            return True
        emitter.emit(error=f"link probe failed ({status}): {detail}",
                     probe_attempts=attempt)
        if status == "error":
            # deterministic failures (import error, broken plugin) don't
            # recover with backoff: one retry covers a transient crash,
            # then bail instead of burning the measurement budget
            errors += 1
            if errors > 1:
                return False
        left = remaining_s()
        if left < backoff_s + budget_s + reserve_s:
            return False
        sleep(backoff_s)
        # never stack a fresh claim-waiter on an abandoned child that is
        # still blocked on the pool: extend the backoff in slices until it
        # exits (reaping its log) or the budget forces giving up
        while _reap_abandoned() > 0:
            if remaining_s() < 15 + budget_s + reserve_s:
                return False
            sleep(15)
