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


def _label_params(params, frozen_stages: int = 1) -> dict:
    """'detector' for backbone/neck parameters, 'head' for the rest; 'frozen'
    for FrozenBatchNorm scale/bias — torch FrozenBatchNorm2d affine terms are
    buffers (never in ``named_parameters``), so the reference's optimizer
    never sees them (``main.py:113``); training them here would both drift
    from the reference and waste gradient compute.

    ``frozen_stages`` mirrors the model knob (mmdet semantics, see
    ``models/resnet.py::ResNet50``): the reference's mmdet-built backbone sets
    the frozen prefix's parameters ``requires_grad=False``, so they never
    reach the optimizer (``main.py:113`` filters on ``requires_grad``).  The
    model's ``stop_gradient`` makes their grads zero; this label keeps AdamW's
    weight decay from shrinking them anyway."""

    frozen_prefixes = {"stem_conv", "stem_bn"} if frozen_stages >= 0 else set()
    for i in range(1, frozen_stages + 1):
        frozen_prefixes.add(f"layer{i}")

    def label(path, _):
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if any(k in _FROZEN_BN for k in keys):
            return "frozen"
        # Stage key is 'layer{i}_block{b}' (unrolled) or 'layer{i}_rest'
        # (scanned tail blocks) — strip either suffix before matching.
        if any(k.split("_block")[0].split("_rest")[0] in frozen_prefixes for k in keys):
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
    frozen_stages: int = 1,
) -> optax.GradientTransformation:
    boundaries = {m * steps_per_epoch: milestone_gamma for m in milestones}
    schedule = optax.piecewise_constant_schedule(learning_rate, boundaries)

    def group(scale: float) -> optax.GradientTransformation:
        return optax.adamw(lambda step: schedule(step) * scale, weight_decay=weight_decay)

    labels = _label_params(params, frozen_stages=frozen_stages)
    return optax.multi_transform(
        {"detector": group(lr_decay), "head": group(1.0), "frozen": optax.set_to_zero()},
        labels,
    )
