"""Training: optimizer/schedule, checkpointing, and the learning engine."""

from skghoi_tpu.train.optimizer import build_optimizer
from skghoi_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from skghoi_tpu.train.engine import LearningEngine

__all__ = ["build_optimizer", "save_checkpoint", "load_checkpoint", "LearningEngine"]
