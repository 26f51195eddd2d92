"""Profiling hooks: jax.profiler traces around train steps / retrieval.

The reference has no profiler (SURVEY.md §5 tracing row); TPU equivalent is a
perfetto-compatible trace dump via ``jax.profiler`` that can be opened at
ui.perfetto.dev or tensorboard.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Trace everything inside the context to ``log_dir``."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing (ms) + simple throughput accounting."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean_ms(self) -> float:
        return 1000.0 * (sum(self.times) / len(self.times)) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        mean = (sum(self.times) / len(self.times)) if self.times else 0.0
        return items_per_step / mean if mean else 0.0
