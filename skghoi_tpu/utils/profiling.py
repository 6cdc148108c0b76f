"""Profiling: XLA trace capture + wall-clock step timing.

The reference has no profiling at all (SURVEY.md §5 — only
``CUDA_LAUNCH_BLOCKING=1`` in a slurm script and a wall-clock timer around
eval).  These helpers are the TPU-native upgrade: ``trace`` wraps
``jax.profiler`` (view with TensorBoard/XProf), ``StepTimer`` gives
HandyTimer-style wall-clock spans with summary stats.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture an XLA profiler trace for the enclosed block.

    Usage::

        with trace("/tmp/profile"):
            train_step(...)  # inspect in TensorBoard's profile tab
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer (HandyTimer replacement, ``utils.py:232-246``)."""

    def __init__(self, maxlen: int = 100):
        self._durations: Deque[float] = deque(maxlen=maxlen)
        self._start: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._durations.append(time.perf_counter() - self._start)
        self._start = None

    def __getitem__(self, i: int) -> float:
        return list(self._durations)[i]

    def mean(self) -> float:
        return sum(self._durations) / max(len(self._durations), 1)

    def last(self) -> float:
        return self._durations[-1] if self._durations else 0.0

    def rate(self, units_per_step: float = 1.0) -> float:
        m = self.mean()
        return units_per_step / m if m > 0 else 0.0
