"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that the multi-chip sharding path
(`mrs_optic_flow_tpu.parallel`) is exercised without TPU hardware — the
stand-in for the reference's dual-backend useOCL cross-check
(src/optic_flow.cpp:853, src/FftMethod.cpp:1824-1836).
"""

import os

# must be set before the first backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Known cosmetic noise with the jit cache: jaxlib 0.9's AOT loader logs a
# spurious ERROR on every cached-executable load (XLA:CPU records the LLVM
# pseudo-features +prefer-no-scatter/gather in the compile target; the host
# prober never reports them, so the machine-match check cries "mismatch" on
# the very machine that compiled).  Execution is correct — cached results
# match fresh compiles.  pytest's capture keeps passing runs clean; the
# lines appear only inside failure reports.  To silence them there too,
# export TF_CPP_MIN_LOG_LEVEL=3 in the SHELL (scripts/ci.sh does) — setting
# it here is too late: the axon sitecustomize loads jaxlib before conftest.
_JIT_CACHE = os.environ.get("MRS_TESTS_JIT_CACHE", "1") != "0"

import jax

# The environment's axon sitecustomize pins jax_platforms via jax.config at
# interpreter startup, which overrides the JAX_PLATFORMS env var — the config
# update below is the only reliable way to force the CPU backend here.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

# The suite's wall-clock is dominated by per-test XLA compiles; CPU
# executables serialize (unlike the tunnelled TPU plugin), so the persistent
# jit cache makes every re-run load them from disk (measured 1.7x on the
# heaviest kernel test).  Keyed by HLO hash — a changed program always
# recompiles.  Opt out with MRS_TESTS_JIT_CACHE=0 (e.g. to time compiles).
if _JIT_CACHE:
    from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.environ.get(
            "MRS_TESTS_JIT_CACHE_DIR",
            os.path.expanduser("~/.cache/mrs_optic_flow_tpu/xla-tests"),
        ),
        force=True,  # the axon-pool guard doesn't apply to the CPU backend
    )

import sys

# interpret-mode Pallas tracing nests deeply; pytest's own frames push the
# default 1000 limit over the edge
sys.setrecursionlimit(10000)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
