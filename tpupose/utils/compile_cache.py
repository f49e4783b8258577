"""Persistent XLA compilation cache (production cold-start lever).

The fused programs here take ~20-40 s each to compile on a TPU backend;
a server restart otherwise pays that again for every geometry it serves.
JAX's persistent compilation cache keys compiled executables by (HLO,
compiler version, device kind) on disk, so warm restarts reload instead
of recompiling.

Opt-in three ways:
  * env:  TPUPOSE_COMPILE_CACHE=/path/to/cache  (read at import)
  * CLI:  --compile-cache /path  (serve)
  * code: enable_compile_cache("/path")
"""

from __future__ import annotations

import os


def enable_compile_cache(
    cache_dir: str, min_compile_secs: float = 1.0
) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns True when the config took (False on config-name drift in
    older/newer JAX versions — callers treat the cache as best-effort).
    Programs cheaper than ``min_compile_secs`` to compile are not
    persisted (cache-file churn costs more than the recompile).
    """
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
    except Exception:
        return False
    try:
        # the cache object is created lazily ONCE; if any compilation
        # already initialised it (with a previous dir, or as disabled),
        # the config update above would silently not take — drop it so
        # the next compilation re-reads the config
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass  # private-API drift: config still applies to a fresh process
    return True


def enable_from_env() -> bool:
    """TPUPOSE_COMPILE_CACHE=<dir> enables the cache at import time."""
    path = os.environ.get("TPUPOSE_COMPILE_CACHE")
    if not path:
        return False
    return enable_compile_cache(path)
