"""Logging helpers: process-0-only logging for multi-host runs.

The reference instantiates an mmdet root logger everywhere but rank-gates its
actual signal through prints (SURVEY.md §5).  Here: one stdlib logger,
silenced on non-primary hosts so multi-host pods log once.
"""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "skghoi_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
    logger.addHandler(handler)
    try:
        import jax

        primary = jax.process_index() == 0
    except Exception:
        primary = True
    logger.setLevel(level if primary else logging.ERROR)
    return logger
