"""JAX platform/runtime setup shared by the CLIs.

- Platform override (the container's sitecustomize pins jax_platforms via
  jax.config, which beats the env var — see tests/conftest.py).
- Persistent compilation cache: the attached TPU compiles through a network
  relay (60-300 s for large programs), so caching compiled executables across
  processes is essential for usable CLI startup.
"""
from __future__ import annotations

import os


def setup_jax(platform: str | None = None, cache_dir: str | None = None) -> None:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = (
        cache_dir
        or os.environ.get("DSS_TPU_JAX_CACHE")
        or os.path.expanduser("~/.cache/dss_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
