"""Profiling / tracing hooks (aux subsystem; SURVEY.md §5).

The reference has no tracing beyond tqdm (SURVEY.md §5 row 1); here
``trace`` wraps ``jax.profiler`` so any block can be captured for
TensorBoard/XProf, and ``StepTimer`` gives cheap per-step wall timings.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
