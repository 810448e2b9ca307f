"""Profiling / tracing hooks (capability upgrade over the reference's
per-iter wall-clock print, train.py:248 — SURVEY.md §5.1).

  * `trace(logdir)`: context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard / Perfetto;
  * `annotate(name)`: TraceAnnotation for host-side spans;
  * `step_metrics`: images/sec + step-time percentiles accumulator.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host span, visible in profiler timelines."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepMetrics:
    """Step-time statistics: mean/percentiles + images/sec."""

    def __init__(self):
        self.durations: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.durations.append(now - self._last)
        self._last = now

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "p99_s": float(np.percentile(d, 99)),
            "images_per_sec": float(items_per_step / d.mean()),
        }
