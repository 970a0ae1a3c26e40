"""Profiling and timing instrumentation.

The reference has no profiling beyond wall-clock prints around final eval
(SURVEY.md §5 "Tracing / profiling").  This module provides:

  * ``trace(dir)`` — context manager around ``jax.profiler.trace`` for
    XLA/TPU timeline capture (view with TensorBoard or Perfetto);
  * ``annotate(name)`` — named trace span (``TraceAnnotation``);
  * ``Timer`` — steady-state throughput harness used by bench.py-style
    measurements: warmup + timed loop, synchronised by a host fetch of a
    scalar reduction (on tunneled backends ``block_until_ready`` can
    return before execution finishes — observed on axon; a scalar fetch
    is a true barrier).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable, Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Steady-state timing of a jitted scalar-returning function."""

    def __init__(self, fn: Callable[..., object], warmup: int = 2,
                 reps: int = 5):
        self.fn = fn
        self.warmup = warmup
        self.reps = reps

    def measure(self, *args) -> Dict[str, float]:
        for _ in range(self.warmup):
            float(self.fn(*args))
        times: List[float] = []
        for _ in range(self.reps):
            t0 = time.perf_counter()
            float(self.fn(*args))
            times.append(time.perf_counter() - t0)
        return {
            "mean_s": statistics.fmean(times),
            "min_s": min(times),
            "max_s": max(times),
            "median_s": statistics.median(times),
        }
