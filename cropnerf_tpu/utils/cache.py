"""Persistent XLA compilation cache.

TPU compiles of the full train step take 30-100 s (and go through a remote
AOT compile service on tunneled setups); caching serialized executables on
disk makes every repeated invocation (bench runs, CLI stages, restarts)
compile-free.  Call :func:`enable_compilation_cache` before the first jit.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.environ.get("CROPNERF_JAX_CACHE", "/tmp/cropnerf_jax_cache")


def enable_compilation_cache(path: str | Path = _DEFAULT) -> None:
    import jax
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
