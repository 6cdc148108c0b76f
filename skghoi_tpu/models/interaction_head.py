"""Interaction head: detection filtering, RoI pooling, classification, losses.

Rebuilds ``heads/adamixer_transH_spatial_r50_head.py:29-429`` with fixed
shapes:

- :func:`filter_detections` — the reference ``preprocess`` (``:92-151``):
  score threshold 0.2, class-wise NMS 0.5, score-sorted, capped at 15 humans +
  15 objects with humans packed first.  Runs fully on device (vmap-able), the
  output layout (humans contiguous at the front) is exactly the invariant the
  reference asserts (``:840-841``).
- :class:`InteractionHead` — RoI pooling (multi-scale RoIAlign), GraphHead,
  pair predictor/suppressor linears (``models/...models.py:176-177``), the
  composite action score
  ``sigmoid(logit_p) * prior_h * prior_o * stop_grad(sigmoid(logit_s))``
  (``:315-316``), and the three losses (``:153-235``): binary focal on the
  composite scores over valid-verb entries (gamma 0.2), focal interactiveness
  on the suppressor (gamma 2.0), TransH margin ranking — each normalized by
  the positive count ``n_p``.  Under a sharded global batch the ``n_p`` sums
  are global, which reproduces the reference's cross-rank
  ``all_reduce(n_p)`` + DDP gradient averaging identically (``:167-172``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from skghoi_tpu import constants as C
from skghoi_tpu.models.graph_head import GraphHead, GraphHeadOutputs
from skghoi_tpu.ops.boxes import batched_nms_keep
from skghoi_tpu.ops.losses import (
    binary_focal_loss,
    binary_focal_loss_with_logits,
    margin_ranking_loss,
)

Array = jax.Array

_NEG_INF = -1e30


class FilteredDetections(NamedTuple):
    boxes: Array  # [B, N, 4]
    labels: Array  # [B, N]
    scores: Array  # [B, N]
    n_h: Array  # [B]
    n: Array  # [B]


class InteractionOutputs(NamedTuple):
    scores: Array  # [B, H, N, K] final action scores (eval semantics)
    logits_p: Array  # [B, H, N, K]
    weights: Array  # [B, H, N] sigmoid suppressor
    prior: Array  # [B, 2, H, N, K]
    pair_valid: Array  # [B, H, N]
    boxes: Array  # [B, N, 4] filtered detections (resized image space)
    object_class: Array  # [B, N]
    n_h: Array
    n: Array
    labels: Optional[Array] = None  # [B, H, N, K]
    unary_labels: Optional[Array] = None
    losses: Optional[dict] = None
    # Non-loss scalars worth logging (e.g. transh_pos_dropped — positives the
    # capped TransH sampler truncated this step); kept out of ``losses`` so
    # ``total_loss`` / engine loss sums stay pure.
    metrics: Optional[dict] = None


def _filter_one(
    boxes: Array,
    labels: Array,
    scores: Array,
    valid: Array,
    human_idx: int,
    box_score_thresh: float,
    box_nms_thresh: float,
    max_human: int,
    max_object: int,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Single-image detection filter; see module docstring."""
    n_slots = max_human + max_object
    valid = valid & (scores >= box_score_thresh)
    keep = batched_nms_keep(boxes, scores, labels, valid, box_nms_thresh)

    order = jnp.argsort(-jnp.where(keep, scores, _NEG_INF))
    s_boxes = boxes[order]
    s_labels = labels[order]
    s_scores = scores[order]
    s_keep = keep[order]

    is_h = s_keep & (s_labels == human_idx)
    is_o = s_keep & (s_labels != human_idx)
    h_rank = jnp.cumsum(is_h)  # 1-based among humans, in score order
    o_rank = jnp.cumsum(is_o)
    n_h = jnp.minimum(h_rank[-1], max_human)
    n_o = jnp.minimum(o_rank[-1], max_object)
    n = n_h + n_o

    # Humans pack into slots [0, n_h), objects into [n_h, n) — the layout the
    # reference achieves by permuting humans to the top (ref :134-142).
    slot = jnp.where(
        is_h & (h_rank <= max_human),
        h_rank - 1,
        jnp.where(is_o & (o_rank <= max_object), n_h + o_rank - 1, n_slots),
    )
    out_boxes = jnp.zeros((n_slots, 4), boxes.dtype).at[slot].set(s_boxes, mode="drop")
    out_labels = jnp.zeros((n_slots,), labels.dtype).at[slot].set(s_labels, mode="drop")
    out_scores = jnp.zeros((n_slots,), scores.dtype).at[slot].set(s_scores, mode="drop")
    return out_boxes, out_labels, out_scores, n_h, n


def filter_detections(
    boxes: Array,
    labels: Array,
    scores: Array,
    valid: Array,
    human_idx: int = C.HICO_HUMAN_IDX,
    box_score_thresh: float = C.BOX_SCORE_THRESH,
    box_nms_thresh: float = C.BOX_NMS_THRESH,
    max_human: int = C.MAX_HUMAN,
    max_object: int = C.MAX_OBJECT,
    targets: Optional[dict] = None,
) -> FilteredDetections:
    """Batched detection filter ``[B, M] -> [B, 30]``.

    With ``targets``, ground-truth boxes are appended ahead of the raw
    detections with score 1.0 (training behavior, ref ``:104-116``) so they
    survive thresholding and sort to the front.
    """
    if targets is not None:
        g = targets["boxes_h"].shape[1]
        gt_scores = jnp.where(targets["valid"], 1.0, 0.0)
        boxes = jnp.concatenate([targets["boxes_h"], targets["boxes_o"], boxes], axis=1)
        scores = jnp.concatenate([gt_scores, gt_scores, scores], axis=1)
        labels = jnp.concatenate(
            [
                jnp.full((boxes.shape[0], g), human_idx, labels.dtype),
                targets["object"].astype(labels.dtype),
                labels,
            ],
            axis=1,
        )
        valid = jnp.concatenate([targets["valid"], targets["valid"], valid], axis=1)

    f = jax.vmap(
        lambda b, l, s, v: _filter_one(
            b, l, s, v, human_idx, box_score_thresh, box_nms_thresh, max_human, max_object
        )
    )
    out_boxes, out_labels, out_scores, n_h, n = f(boxes, labels, scores, valid)
    return FilteredDetections(out_boxes, out_labels, out_scores, n_h, n)


class InteractionHead(nn.Module):
    num_cls: int = C.HICO_NUM_VERBS
    human_idx: int = C.HICO_HUMAN_IDX
    num_object: int = C.HICO_NUM_OBJECTS
    representation_size: int = C.REPRESENTATION_SIZE
    num_iter: int = C.NUM_MP_ITERATIONS
    max_humans: int = C.MAX_HUMAN
    fg_iou_thresh: float = C.FG_IOU_THRESH
    feedback: bool = False
    quirk_box_index_tails: bool = False
    transh_margin: float = C.TRANSH_MARGIN
    dtype: Any = jnp.float32

    def setup(self):
        self.box_pair_head = GraphHead(
            num_cls=self.num_cls,
            human_idx=self.human_idx,
            num_object=self.num_object,
            representation_size=self.representation_size,
            num_iter=self.num_iter,
            max_humans=self.max_humans,
            fg_iou_thresh=self.fg_iou_thresh,
            feedback=self.feedback,
            quirk_box_index_tails=self.quirk_box_index_tails,
            dtype=self.dtype,
        )
        # models/...models.py:176-177
        self.box_pair_predictor = nn.Dense(self.num_cls, dtype=self.dtype)
        self.box_pair_suppressor = nn.Dense(1, dtype=self.dtype)

    def __call__(
        self,
        fpn_features,  # tuple of 4 [B, h, w, 256] maps, finest first
        detections: FilteredDetections,
        image_sizes: Array,  # [B, 2]
        object_verb_mask: Array,  # [num_object, K]
        targets: Optional[dict] = None,
        *,
        training: bool = False,
        rng: Optional[Array] = None,
    ) -> InteractionOutputs:
        boxes, obj_labels, obj_scores, n_h, n = detections

        # Multi-scale RoIAlign over the padded box set (parameterless).
        # On TPU this is the Pallas separable-matmul kernel with a custom
        # VJP (window-scatter backward), so both inference and training use
        # it; off-TPU the differentiable gather formulation runs.
        from skghoi_tpu.ops.pallas_roi_align import roi_align_auto

        box_features = roi_align_auto(fpn_features, boxes)

        # Global context: average-pool the coarsest level (ref :811).
        global_features = jnp.mean(fpn_features[3], axis=(1, 2))

        gh: GraphHeadOutputs = self.box_pair_head(
            global_features,
            box_features,
            boxes,
            obj_labels,
            obj_scores,
            n_h,
            n,
            image_sizes,
            object_verb_mask,
            targets,
            training=training,
            rng=rng,
        )

        logits_p = self.box_pair_predictor(gh.pair_features)  # [B, H, N, K]
        logits_s = self.box_pair_suppressor(gh.pair_features)[..., 0]  # [B, H, N]

        weights = jax.nn.sigmoid(logits_s)
        prior_prod = gh.prior[:, 0] * gh.prior[:, 1]  # [B, H, N, K]
        # Final action score (ref :315-316); suppressor weight detached.
        scores = (
            jax.nn.sigmoid(logits_p)
            * prior_prod
            * jax.lax.stop_gradient(weights)[..., None]
        )
        valid_entries = gh.prior[:, 0] > 0  # nonzero-prior (x, y) entries (ref :315)
        scores = jnp.where(valid_entries, scores, 0.0)

        losses = None
        metrics = None
        if training and targets is not None:
            losses = self._compute_losses(
                scores, logits_s, gh, valid_entries
            )
            if gh.transh_pos_dropped is not None:
                metrics = dict(transh_pos_dropped=gh.transh_pos_dropped)

        return InteractionOutputs(
            scores=scores,
            logits_p=logits_p,
            weights=weights,
            prior=gh.prior,
            pair_valid=gh.pair_valid,
            boxes=boxes,
            object_class=obj_labels,
            n_h=n_h,
            n=n,
            labels=gh.labels,
            unary_labels=gh.unary_labels,
            losses=losses,
            metrics=metrics,
        )

    def _compute_losses(
        self,
        scores: Array,
        logits_s: Array,
        gh: GraphHeadOutputs,
        valid_entries: Array,
    ) -> dict:
        # HOI classification: focal (gamma 0.2) on composite scores over
        # nonzero-prior entries, summed / n_p (ref :153-177).  The composite
        # score is already a probability, so the probability-form focal loss
        # applies directly.
        cls_labels = gh.labels
        n_p_cls = jnp.maximum(jnp.sum(cls_labels * valid_entries), 1.0)
        hoi_loss = (
            binary_focal_loss(
                scores,
                cls_labels,
                gamma=C.FOCAL_GAMMA_HOI,
                reduction="sum",
                mask=valid_entries,
            )
            / n_p_cls
        )

        # Interactiveness: focal (gamma 2.0) on suppressor over valid pairs
        # (ref :180-205).
        n_p_unary = jnp.maximum(jnp.sum(gh.unary_labels * gh.pair_valid), 1.0)
        interactiveness_loss = (
            binary_focal_loss_with_logits(
                logits_s,
                gh.unary_labels,
                gamma=C.FOCAL_GAMMA_INTERACTIVENESS,
                reduction="sum",
                mask=gh.pair_valid,
            )
            / n_p_unary
        )

        # TransH margin ranking over balanced pos/neg samples / n_p (ref
        # :207-235 — implementing the coherent semantics; the committed call
        # signature raises TypeError upstream, SURVEY.md §2.5-3).
        transh_loss = (
            margin_ranking_loss(
                gh.transh_pos, gh.transh_neg, margin=self.transh_margin, mask=gh.transh_mask
            )
            / n_p_unary
        )

        return dict(
            hoi_loss=hoi_loss,
            interactiveness_loss=interactiveness_loss,
            transh_loss=transh_loss,
        )
