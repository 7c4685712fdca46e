"""Persistent XLA compilation cache.

The reference JIT-builds its OpenCL kernel from source on every process
start (``src/FftMethod.cpp:344-345``); the TPU equivalent of shipping
prebuilt binaries is JAX's persistent compilation cache — first bring-up
compiles (~20-40 s on TPU), every later process loads the executable from
disk in milliseconds.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None, force: bool = False) -> str | None:
    """Enable the on-disk jit cache (idempotent). Returns the directory.

    No-op under the tunnelled axon TPU backend (detected via
    PALLAS_AXON_POOL_IPS): its PJRT plugin cannot serialize executables, so
    every large program pays the serialization *attempt* (~2x compile time)
    and caches nothing.  Pass ``force=True`` to enable anyway.
    """
    import jax

    if os.environ.get("PALLAS_AXON_POOL_IPS") and not force:
        return None
    path = path or os.environ.get(
        "MRS_OPTIC_FLOW_CACHE", os.path.expanduser("~/.cache/mrs_optic_flow_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
