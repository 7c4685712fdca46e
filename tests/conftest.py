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

import jax

# The environment's axon sitecustomize pins jax_platforms via jax.config at
# interpreter startup, which overrides the JAX_PLATFORMS env var — the config
# update below is the only reliable way to force the CPU backend here.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

import sys

# interpret-mode Pallas tracing nests deeply; pytest's own frames push the
# default 1000 limit over the edge
sys.setrecursionlimit(10000)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
