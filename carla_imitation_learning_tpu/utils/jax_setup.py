"""Process-level JAX setup: persistent compilation cache.

TPU compiles are 10s-100s of seconds (and this container routes them through
a remote compile service); the persistent cache makes re-runs near-instant.
Safe to call multiple times.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    # Explicit platform override. The container's sitecustomize force-sets
    # JAX_PLATFORMS=axon at interpreter start (clobbering the caller's env),
    # so a plain ``JAX_PLATFORMS=cpu python benchmarks/...`` still lands on
    # the TPU; TPUIL_PLATFORM wins through jax.config AFTER that — the same
    # mechanism tests/conftest.py uses for the hermetic 8-device CPU mesh.
    plat = os.environ.get("TPUIL_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache = cache_dir or os.environ.get(
        "TPUIL_COMPILE_CACHE", os.path.expanduser("~/.cache/tpuil_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
