"""Loss functions: binary focal loss and the TransH margin-ranking loss.

Reference semantics:
  * ``binary_focal_loss`` — ``ops.py:159-211``:
      ``L = |1 - y - alpha| * (|y - x| + eps)^gamma * BCE(x, y)``
    applied to post-sigmoid scores, summed and normalized by the (cross-device
    averaged) positive count by the callers
    (``heads/adamixer_transH_spatial_r50_head.py:153-205``).
  * margin-ranking loss — ``heads/MarginLoss.py:28-36`` with margin 1
    (``heads/...head.py:229-233``): ``max(p - n, -margin).mean() + margin``.

All functions take an optional boolean ``mask`` so fixed-shape padded batches
contribute nothing from padding slots; masked ``mean`` divides by the number of
valid entries.  The logits variant computes the same value from raw logits with
a numerically stable BCE, which is the form the model uses on TPU (one fused
sigmoid never materialized in HBM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from skghoi_tpu.constants import FOCAL_ALPHA, FOCAL_EPS

Array = jax.Array


def _reduce(loss: Array, mask: Optional[Array], reduction: str) -> Array:
    if mask is not None:
        loss = jnp.where(mask, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if mask is None:
            return jnp.mean(loss)
        denom = jnp.maximum(jnp.sum(mask.astype(loss.dtype)), 1.0)
        return jnp.sum(loss) / denom
    raise ValueError(f"Unsupported reduction method {reduction}")


def binary_focal_loss(
    x: Array,
    y: Array,
    alpha: float = FOCAL_ALPHA,
    gamma: float = 2.0,
    reduction: str = "mean",
    eps: float = FOCAL_EPS,
    mask: Optional[Array] = None,
) -> Array:
    """Focal loss on post-sigmoid scores ``x`` vs binary labels ``y``.

    Exact reference formula (``ops.py:200-203``), Lin et al. 1708.02002.
    """
    x = jnp.clip(x, eps, 1.0 - eps)
    bce = -(y * jnp.log(x) + (1.0 - y) * jnp.log(1.0 - x))
    loss = jnp.abs(1.0 - y - alpha) * (jnp.abs(y - x) + eps) ** gamma * bce
    return _reduce(loss, mask, reduction)


def binary_focal_loss_with_logits(
    logits: Array,
    y: Array,
    alpha: float = FOCAL_ALPHA,
    gamma: float = 2.0,
    reduction: str = "mean",
    eps: float = FOCAL_EPS,
    mask: Optional[Array] = None,
) -> Array:
    """Same value as :func:`binary_focal_loss` with ``x = sigmoid(logits)``.

    Uses the log-sum-exp-stable BCE, so large-magnitude logits neither
    overflow nor lose the gradient signal.
    """
    x = jax.nn.sigmoid(logits)
    # Stable BCE(sigmoid(z), y) = max(z, 0) - z*y + log1p(exp(-|z|))
    bce = jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = jnp.abs(1.0 - y - alpha) * (jnp.abs(y - x) + eps) ** gamma * bce
    return _reduce(loss, mask, reduction)


def margin_ranking_loss(
    positive_scores: Array,
    negative_scores: Array,
    margin: float = 1.0,
    mask: Optional[Array] = None,
) -> Array:
    """TransH margin-ranking loss: ``max(p - n, -margin).mean() + margin``.

    ``positive_scores`` / ``negative_scores`` are distance-style scores (lower
    is better for positives), paired elementwise as in the reference's
    ``NegativeSampling`` pos/neg split (``heads/NegativeSampling.py:30-40``)
    feeding ``MarginLoss.forward`` (``heads/MarginLoss.py:28-36``).

    With a ``mask``, padded pairs are excluded from the mean; an all-false mask
    yields exactly ``0`` (no margin offset), making the loss vanish for images
    without positive pairs instead of contributing a constant.
    """
    raw = jnp.maximum(positive_scores - negative_scores, -margin)
    if mask is None:
        return jnp.mean(raw) + margin
    mask_f = mask.astype(raw.dtype)
    n_valid = jnp.sum(mask_f)
    mean = jnp.sum(jnp.where(mask, raw, 0.0)) / jnp.maximum(n_valid, 1.0)
    return jnp.where(n_valid > 0, mean + margin, 0.0)
