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

import os
import signal


def _timeout(signum, frame):
    raise TimeoutError("BENCH_TIMEOUT_S exceeded")


def install_alarm(default_s: int = 540) -> int:
    """Arm a raising ``SIGALRM`` with the ``BENCH_TIMEOUT_S`` budget
    (defaulting to ``default_s``); returns the budget in seconds."""
    signal.signal(signal.SIGALRM, _timeout)
    budget = int(os.environ.get("BENCH_TIMEOUT_S", str(default_s)))
    signal.alarm(budget)
    return budget


def clear_axon_env() -> None:
    """Clear exactly the sandbox's ``JAX_PLATFORMS=axon`` pin (preserving
    deliberate overrides like ``"cpu"``) so jax's auto-pick resolves the
    TPU through the registered plugin."""
    if os.environ.get("JAX_PLATFORMS") == "axon":
        os.environ["JAX_PLATFORMS"] = ""
