"""Tracing / profiling harness (SURVEY.md section 5.1).

The reference has no profiling beyond ad-hoc prints; this module gives
the framework a real one: wall-clock timing helpers that respect JAX
async dispatch, and jax.profiler trace capture for xprof/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def time_fn(
    fn: Callable, *args, warmup: int = 2, iters: int = 10, **kwargs
) -> dict[str, float]:
    """Wall-clock stats for a device function (blocks on results)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_ms": 1e3 * sum(times) / len(times),
        "p50_ms": 1e3 * times[len(times) // 2],
        "min_ms": 1e3 * times[0],
        "max_ms": 1e3 * times[-1],
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
