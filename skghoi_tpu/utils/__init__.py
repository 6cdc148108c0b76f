"""Observability: profiling hooks, timers, logging helpers."""

from skghoi_tpu.utils.profiling import StepTimer, trace
from skghoi_tpu.utils.logging import get_logger

__all__ = ["StepTimer", "trace", "get_logger"]
