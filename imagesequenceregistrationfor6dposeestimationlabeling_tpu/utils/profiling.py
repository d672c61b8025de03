"""Profiling / observability.

The reference imports tensorboard + torch profiler but never wires them
(SURVEY.md §5).  Here: jax.profiler traces + simple step timers + a CSV
metrics logger, so training runs are actually observable.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup-aware summaries."""

    def __init__(self, skip_first: int = 2):
        self.times = []
        self.skip_first = skip_first
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t)

    @property
    def steady(self):
        return self.times[self.skip_first :] if len(self.times) > self.skip_first else self.times

    def steps_per_sec(self) -> float:
        s = self.steady
        return len(s) / max(sum(s), 1e-9)

    def mean_ms(self) -> float:
        s = self.steady
        return 1000.0 * sum(s) / max(len(s), 1)


class MetricsLogger:
    """Append-only CSV logger (replaces the reference's print()-only
    loss logging, trainNerfFine.py:342-347)."""

    def __init__(self, path: str, fields):
        self.path = path
        self.fields = list(fields)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(["step"] + self.fields)

    def log(self, step: int, **values):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow([step] + [values.get(k, "") for k in self.fields])
