"""Persistent XLA compilation cache (opt-in).

TPU compiles of the full train step take 30-100 s (and go through a remote
AOT compile service on tunneled setups); caching serialized executables on
disk makes repeated invocations compile-free.

**Opt-in via ``CROPNERF_JAX_CACHE=<dir>``, OFF by default.**  Measured
failure mode on the axon remote-AOT setup (2026-08): a cache entry written
under one compile-service state deserialises into an executable that runs
~1000x slow (a 0.6 ms train step taking ~10 s) with no error — far worse
than paying the compile.  Only enable where cached executables are known
good for the exact runtime.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str | Path | None = None) -> None:
    path = path or os.environ.get("CROPNERF_JAX_CACHE")
    if not path:
        return
    import jax
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
