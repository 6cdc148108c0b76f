"""Optimizer with the reference's two-group AdamW + milestone schedule.

Reference (``configures/hicodet/adamixer_transH_spatial_r50_main.py:108-134``):
parameters under ``detector*`` train at ``lr * lr_decay`` (0.1), everything
else at ``lr`` (1e-4); AdamW weight decay 1e-4; ``LambdaLR`` multiplies the lr
by 0.1 from epoch 6 (``:151-166``).  Here that is an ``optax.multi_transform``
keyed on the parameter path, with a piecewise-constant schedule in steps.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax

from skghoi_tpu import constants as C


_FROZEN_BN = {"stem_bn", "bn1", "bn2", "bn3", "downsample_bn"}


def _label_params(params) -> dict:
    """'detector' for backbone/neck parameters, 'head' for the rest; 'frozen'
    for FrozenBatchNorm scale/bias — torch FrozenBatchNorm2d affine terms are
    buffers (never in ``named_parameters``), so the reference's optimizer
    never sees them (``main.py:113``); training them here would both drift
    from the reference and waste gradient compute."""

    def label(path, _):
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if any(k in _FROZEN_BN for k in keys):
            return "frozen"
        return "detector" if "detector" in keys else "head"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params,
    learning_rate: float = C.LEARNING_RATE,
    lr_decay: float = C.LR_DECAY_BACKBONE,
    weight_decay: float = C.WEIGHT_DECAY,
    steps_per_epoch: int = 1,
    milestones: Sequence[int] = (C.LR_MILESTONE_EPOCH,),
    milestone_gamma: float = C.LR_MILESTONE_GAMMA,
) -> optax.GradientTransformation:
    boundaries = {m * steps_per_epoch: milestone_gamma for m in milestones}
    schedule = optax.piecewise_constant_schedule(learning_rate, boundaries)

    def group(scale: float) -> optax.GradientTransformation:
        return optax.adamw(lambda step: schedule(step) * scale, weight_decay=weight_decay)

    labels = _label_params(params)
    return optax.multi_transform(
        {"detector": group(lr_decay), "head": group(1.0), "frozen": optax.set_to_zero()},
        labels,
    )
