"""Trainable single-stage detector on the shared ResNet50+FPN backbone.

The reference's stage-1 options are external pretrained detectors (torchvision
Faster R-CNN, mmdet AdaMixer) plus an in-repo DETR fine-tuning path
(``hicodet/detections/main_detr.py``).  This module provides the in-repo
trainable counterpart as a RetinaNet-style head — anchors, focal
classification, smooth-L1 box regression — chosen because every piece maps
onto fixed-shape TPU ops we already have (batched NMS, IoU, focal loss):

- anchors on the stride-8/16/32 FPN levels (3 scales x 3 ratios);
- training: per-anchor IoU matching (>=0.5 positive, <0.4 background,
  in-between ignored), alpha-balanced focal (0.25/2.0) normalized by the
  positive count, smooth-L1 on the standard box deltas;
- inference: top-k per level, delta decoding, class-wise NMS via
  :func:`skghoi_tpu.ops.boxes.batched_nms_keep` — all jittable.

Output detections feed :func:`skghoi_tpu.detect.generate.generate_model_detections`
to produce the stage-2 cache JSONs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu import constants as C
from skghoi_tpu.models.backbone import DetectorBackbone
from skghoi_tpu.ops.boxes import batched_nms_keep, box_iou
from skghoi_tpu.ops.losses import binary_focal_loss_with_logits

Array = jax.Array

ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ANCHOR_SCALES = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))
NUM_ANCHORS = len(ANCHOR_RATIOS) * len(ANCHOR_SCALES)
DET_STRIDES = (8, 16, 32)  # P3-P5 of our 4-level pyramid


def generate_anchors(canvas: Tuple[int, int], strides: Sequence[int] = DET_STRIDES) -> np.ndarray:
    """All anchors for a fixed canvas, ``[sum_l H_l*W_l*9, 4]`` (x1,y1,x2,y2)."""
    out = []
    for s in strides:
        h, w = canvas[0] // s, canvas[1] // s
        base = 4 * s  # anchor base size: 4x the stride
        ws, hs = [], []
        for r in ANCHOR_RATIOS:
            for sc in ANCHOR_SCALES:
                ws.append(base * sc * (1.0 / r) ** 0.5)
                hs.append(base * sc * r**0.5)
        ws = np.asarray(ws)
        hs = np.asarray(hs)
        cy, cx = np.meshgrid(
            (np.arange(h) + 0.5) * s, (np.arange(w) + 0.5) * s, indexing="ij"
        )
        cx = cx[..., None]
        cy = cy[..., None]
        boxes = np.stack(
            [cx - ws / 2, cy - hs / 2, cx + ws / 2, cy + hs / 2], axis=-1
        )  # [h, w, 9, 4]
        out.append(boxes.reshape(-1, 4))
    return np.concatenate(out).astype(np.float32)


def encode_deltas(anchors: Array, boxes: Array) -> Array:
    """Standard (dx, dy, dw, dh) parameterization."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-3)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-3)
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack(
        [(bx - ax) / aw, (by - ay) / ah, jnp.log(bw / aw), jnp.log(bh / ah)], axis=-1
    )


def decode_deltas(anchors: Array, deltas: Array) -> Array:
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bx = deltas[..., 0] * aw + ax
    by = deltas[..., 1] * ah + ay
    bw = jnp.exp(jnp.clip(deltas[..., 2], -4.0, 4.0)) * aw
    bh = jnp.exp(jnp.clip(deltas[..., 3], -4.0, 4.0)) * ah
    return jnp.stack([bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1)


class FPNDetector(nn.Module):
    """Backbone + shared cls/box subnets over the detection levels."""

    num_classes: int = C.HICO_NUM_OBJECTS
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = DetectorBackbone(dtype=self.dtype)
        conv = lambda name: nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=name)
        self.cls_convs = [conv(f"cls{i}") for i in range(4)]
        self.box_convs = [conv(f"box{i}") for i in range(4)]
        # Bias init ~ -log((1-pi)/pi), pi=0.01: stabilizes early focal loss.
        self.cls_out = nn.Conv(
            NUM_ANCHORS * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, bias_init=nn.initializers.constant(-4.595), name="cls_out",
        )
        self.box_out = nn.Conv(
            NUM_ANCHORS * 4, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="box_out"
        )

    def __call__(self, images: Array) -> Tuple[Array, Array]:
        """-> (cls_logits [B, A_total, K], box_deltas [B, A_total, 4])."""
        feats = self.backbone(images)[1:]  # P3-P5
        b = images.shape[0]
        logits, deltas = [], []
        for f in feats:
            c = f
            for conv in self.cls_convs:
                c = nn.relu(conv(c))
            logits.append(self.cls_out(c).reshape(b, -1, self.num_classes))
            d = f
            for conv in self.box_convs:
                d = nn.relu(conv(d))
            deltas.append(self.box_out(d).reshape(b, -1, 4))
        return (
            jnp.concatenate(logits, axis=1).astype(jnp.float32),
            jnp.concatenate(deltas, axis=1).astype(jnp.float32),
        )


def match_anchors(
    anchors: Array, gt_boxes: Array, gt_labels: Array, gt_valid: Array,
    pos_iou: float = 0.5, neg_iou: float = 0.4,
) -> Tuple[Array, Array, Array]:
    """Per-anchor targets for one image.

    Returns (cls_target [A, K] one-hot, box_target [A, 4] deltas,
    anchor_state [A]: 1 positive, 0 background, -1 ignored).
    """
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best = jnp.max(iou, axis=1)
    best_idx = jnp.argmax(iou, axis=1)
    pos = best >= pos_iou
    neg = best < neg_iou
    state = jnp.where(pos, 1, jnp.where(neg, 0, -1))
    labels = gt_labels[best_idx]
    cls_t = jax.nn.one_hot(labels, C.HICO_NUM_OBJECTS) * pos[:, None]
    box_t = encode_deltas(anchors, gt_boxes[best_idx])
    return cls_t, box_t, state


def detector_loss(
    logits: Array, deltas: Array, anchors: Array,
    gt_boxes: Array, gt_labels: Array, gt_valid: Array,
) -> dict:
    """Batched focal + smooth-L1 losses, normalized by the positive count."""
    cls_t, box_t, state = jax.vmap(
        lambda b, l, v: match_anchors(anchors, b, l, v)
    )(gt_boxes, gt_labels, gt_valid)
    valid = state >= 0
    n_pos = jnp.maximum(jnp.sum(state == 1), 1.0)

    # RetinaNet focal: alpha 0.25 (|1-y-alpha| weights positives by 0.25,
    # negatives by 0.75), gamma 2, sum / n_positive.
    cls_loss = (
        binary_focal_loss_with_logits(
            logits, cls_t, alpha=0.25, gamma=2.0, reduction="sum",
            mask=valid[..., None],
        )
        / n_pos
    )

    diff = jnp.abs(deltas - box_t)
    smooth = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
    box_loss = jnp.sum(smooth * (state == 1)[..., None]) / n_pos
    return dict(cls_loss=cls_loss, box_loss=box_loss)


class Detections(NamedTuple):
    boxes: Array  # [B, M, 4]
    labels: Array  # [B, M]
    scores: Array  # [B, M]
    valid: Array  # [B, M]


def decode_detections(
    logits: Array, deltas: Array, anchors: Array, canvas: Tuple[int, int],
    score_thresh: float = 0.05, nms_thresh: float = 0.5, max_out: int = 100,
    pre_nms_topk: int = 1000,
) -> Detections:
    """Jittable inference decoding: topk -> decode -> class-wise NMS."""

    def one(lg, dl):
        scores_all = jax.nn.sigmoid(lg)  # [A, K]
        best_score = jnp.max(scores_all, axis=1)
        best_cls = jnp.argmax(scores_all, axis=1)
        top_score, top_idx = jax.lax.top_k(best_score, pre_nms_topk)
        boxes = decode_deltas(anchors[top_idx], dl[top_idx])
        boxes = jnp.stack(
            [
                jnp.clip(boxes[:, 0], 0, canvas[1]),
                jnp.clip(boxes[:, 1], 0, canvas[0]),
                jnp.clip(boxes[:, 2], 0, canvas[1]),
                jnp.clip(boxes[:, 3], 0, canvas[0]),
            ],
            axis=-1,
        )
        labels = best_cls[top_idx]
        ok = top_score >= score_thresh
        keep = batched_nms_keep(boxes, top_score, labels, ok, nms_thresh)
        order = jnp.argsort(-jnp.where(keep, top_score, -1.0))[:max_out]
        return boxes[order], labels[order], top_score[order], keep[order]

    b, l, s, v = jax.vmap(one)(logits, deltas)
    return Detections(b, l, s, v)
