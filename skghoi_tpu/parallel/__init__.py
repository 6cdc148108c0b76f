"""Device mesh + sharded train/eval steps (the NCCL-DDP replacement)."""

from skghoi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from skghoi_tpu.parallel.train_step import build_eval_step, build_train_step

__all__ = ["make_mesh", "shard_batch", "replicate", "build_train_step", "build_eval_step"]
