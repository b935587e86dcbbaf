"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference prints wall-clock fps at most; here profiling is first-class:
``trace()`` wraps ``jax.profiler`` (view in TensorBoard/Perfetto) and
``time_fn`` is the micro-benchmark harness used for per-kernel numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/svo_trace"):
    """Profile a block: `with trace(): run()` → TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> float:
    """Median wall time (s) of a jitted function, properly synchronized."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
