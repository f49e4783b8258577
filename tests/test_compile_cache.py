"""Persistent compilation cache knob (utils/compile_cache.py).

Production cold-start lever: serve's fused programs take 20-40 s each to
compile on TPU; the persistent cache makes warm restarts reload them
from disk. The test pins that the knob actually routes compilations into
the chosen directory (CPU backend — the cache is backend-generic).
"""

import jax
import jax.numpy as jnp

from tpupose.utils.compile_cache import enable_compile_cache


def test_compile_cache_populates_dir(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    d = str(tmp_path / "cache")
    assert enable_compile_cache(d, min_compile_secs=0.0)
    try:

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((32, 32))).block_until_ready()
        entries = list((tmp_path / "cache").iterdir())
        assert entries, "no cache entries written"
    finally:
        # restore the SUITE's cache config (conftest points it at the
        # shared /tmp cache with a 1 s persistence threshold; leaving
        # tmp_path/None or the 0 s threshold would run the rest of the
        # compile-bound suite uncached / churn trivial entries)
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
