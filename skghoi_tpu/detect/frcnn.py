"""torchvision-format Faster R-CNN (ResNet50-FPN): weight import + inference.

The reference's standard stage-1 path runs a pretrained torchvision
``fasterrcnn_resnet_fpn`` over the dataset and caches per-image detection
JSONs (``hicodet/detections/preprocessing.py:36-76``).  This module is the
TPU-native counterpart: the exact torchvision architecture re-expressed in
Flax with fixed shapes throughout (top-k instead of data-dependent
filtering, mask-style NMS), plus :func:`load_torch_fasterrcnn`, which maps a
torchvision ``fasterrcnn_resnet50_fpn`` ``state_dict`` (old and new key
layouts) onto the parameter tree — so the published COCO checkpoint, or the
reference's fine-tuned ``model_state_dict``, drives detection generation
here without torchvision.

Architecture parity (torchvision ``models/detection/faster_rcnn.py``):

- backbone: ResNet-50 (frozen BN) + FPN (1x1 inner / 3x3 layer convs) with
  a LastLevelMaxPool P6;
- RPN: shared 3x3 conv head, 3 anchors per cell — sizes 32..512 one per
  level, ratios (0.5, 1, 2), base anchors rounded like
  ``AnchorGenerator.generate_anchors``; top-1000 per level pre-NMS, NMS 0.7
  with levels as categories, top-1000 overall;
- RoI heads: MultiScaleRoIAlign 7x7 on P2..P5 -> TwoMLPHead (fc6/fc7,
  1024) -> FastRCNNPredictor (91 classes); per-class decode with weights
  (10, 10, 5, 5), score threshold, class-wise NMS 0.5, top-100.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.models.backbone import load_torch_resnet50
from skghoi_tpu.models.fpn import FPN
from skghoi_tpu.models.resnet import ResNet50
from skghoi_tpu.ops.boxes import batched_nms_keep
from skghoi_tpu.ops.roi_align import multiscale_roi_align

Array = jax.Array

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # one per level P2..P6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def anchors_for_level(canvas: Tuple[int, int], stride: int, size: int) -> np.ndarray:
    """torchvision ``AnchorGenerator`` anchors for one level, ``[H*W*3, 4]``.

    Base anchors are centered at 0 and **rounded** (``generate_anchors``),
    then shifted by ``stride * (x, y)`` with no half-cell offset.
    """
    h_r = np.sqrt(np.asarray(ANCHOR_RATIOS))
    w_r = 1.0 / h_r
    ws = np.round(w_r * size / 2)
    hs = np.round(h_r * size / 2)
    base = np.stack([-ws, -hs, ws, hs], axis=1)  # [3, 4]
    gh, gw = canvas[0] // stride, canvas[1] // stride
    sy, sx = np.meshgrid(np.arange(gh) * stride, np.arange(gw) * stride, indexing="ij")
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def decode_boxes(anchors: Array, deltas: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """torchvision ``BoxCoder.decode_single``."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw * 0.5
    ay = anchors[..., 1] + ah * 0.5
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, None, BBOX_XFORM_CLIP)
    cx = dx * aw + ax
    cy = dy * ah + ay
    bw = jnp.exp(dw) * aw
    bh = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - bw * 0.5, cy - bh * 0.5, cx + bw * 0.5, cy + bh * 0.5], axis=-1
    )


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / box-delta predictions."""

    num_anchors: int = len(ANCHOR_RATIOS)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: Array) -> Tuple[Array, Array]:
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")(feat)
        x = nn.relu(x)
        logits = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")(x)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")(x)
        b = feat.shape[0]
        return logits.reshape(b, -1), deltas.reshape(b, -1, 4)


class TwoMLPHead(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array) -> Array:
        # torchvision flattens [N, 256, 7, 7] in NCHW order; our pooled
        # features are [N, 7, 7, 256], so match the flatten order explicitly.
        n = pooled.shape[0]
        x = pooled.transpose(0, 3, 1, 2).reshape(n, -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int = 91
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas.reshape(-1, self.num_classes, 4)


class FRCNNDetections(NamedTuple):
    boxes: Array  # [B, D, 4]
    labels: Array  # [B, D] (COCO ids, 0 = invalid slot)
    scores: Array  # [B, D]
    valid: Array  # [B, D] bool


class FasterRCNN(nn.Module):
    """Inference-only torchvision Faster R-CNN with static shapes."""

    num_classes: int = 91
    pre_nms_top_n: int = 1000
    post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    score_topk: int = 2000  # fixed-shape stand-in for score-threshold filtering
    dtype: Any = jnp.float32

    def setup(self):
        self.body = ResNet50(dtype=self.dtype)
        self.fpn = FPN(dtype=self.dtype)
        self.rpn_head = RPNHead(dtype=self.dtype)
        self.box_head = TwoMLPHead(dtype=self.dtype)
        self.box_predictor = FastRCNNPredictor(num_classes=self.num_classes, dtype=self.dtype)

    def __call__(self, images: Array, image_sizes: Array) -> FRCNNDetections:
        """``images``: [B, H, W, 3] already normalized/resized; ``image_sizes``:
        [B, 2] (h, w) valid extents within the padded canvas."""
        b, H, W = images.shape[0], images.shape[1], images.shape[2]
        feats = self.fpn(self.body(images))  # P2..P5
        p6 = nn.max_pool(feats[-1], (1, 1), strides=(2, 2))
        rpn_feats = (*feats, p6)
        strides = (4, 8, 16, 32, 64)

        # --- RPN: per-level top-k, decode, clip, NMS across levels ----------
        all_boxes, all_scores, all_lvl = [], [], []
        for lvl, (f, s, size) in enumerate(zip(rpn_feats, strides, ANCHOR_SIZES)):
            logits, deltas = self.rpn_head(f)
            anchors = jnp.asarray(anchors_for_level((H, W), s, size))
            k = min(self.pre_nms_top_n, logits.shape[1])
            top, idx = jax.lax.top_k(logits, k)
            boxes = decode_boxes(jnp.take(anchors, idx, axis=0),
                                 jnp.take_along_axis(deltas, idx[..., None], axis=1))
            all_boxes.append(boxes)
            all_scores.append(top)
            all_lvl.append(jnp.full((b, k), lvl, jnp.int32))
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jax.nn.sigmoid(jnp.concatenate(all_scores, axis=1))
        lvls = jnp.concatenate(all_lvl, axis=1)

        hw = image_sizes[:, None, :]  # [B, 1, 2]
        boxes = clip_boxes(boxes, hw)
        ws = boxes[..., 2] - boxes[..., 0]
        hs = boxes[..., 3] - boxes[..., 1]
        ok = (ws >= 1e-3) & (hs >= 1e-3)
        keep = jax.vmap(
            lambda bx, sc, lv, v: batched_nms_keep(bx, sc, lv, v, self.rpn_nms_thresh)
        )(boxes, scores, lvls, ok)
        prop_scores = jnp.where(keep, scores, -jnp.inf)
        k = min(self.post_nms_top_n, prop_scores.shape[1])
        top, idx = jax.lax.top_k(prop_scores, k)
        proposals = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # [B, K, 4]
        prop_valid = jnp.isfinite(top)

        # --- RoI heads -----------------------------------------------------
        pooled = jax.vmap(
            lambda f0, f1, f2, f3, bx: multiscale_roi_align((f0, f1, f2, f3), bx)
        )(*feats, proposals)  # [B, K, 7, 7, 256]
        n = b * k
        x = self.box_head(pooled.reshape(n, 7, 7, -1))
        cls_scores, box_deltas = self.box_predictor(x)
        probs = jax.nn.softmax(cls_scores, axis=-1).reshape(b, k, self.num_classes)
        box_deltas = box_deltas.reshape(b, k, self.num_classes, 4)

        # Per-class boxes for classes 1..C-1 (skip background 0).
        dec = decode_boxes(
            proposals[:, :, None, :], box_deltas[:, :, 1:, :], weights=(10.0, 10.0, 5.0, 5.0)
        )  # [B, K, C-1, 4]
        dec = clip_boxes(dec, hw[:, :, None, :])
        cls_probs = probs[:, :, 1:]
        labels = jnp.broadcast_to(
            jnp.arange(1, self.num_classes, dtype=jnp.int32)[None, None, :], cls_probs.shape
        )
        flat_boxes = dec.reshape(b, -1, 4)
        flat_scores = cls_probs.reshape(b, -1)
        flat_labels = labels.reshape(b, -1)
        flat_valid = (
            prop_valid[:, :, None] & jnp.full(cls_probs.shape, True)
        ).reshape(b, -1)
        ws = flat_boxes[..., 2] - flat_boxes[..., 0]
        hs = flat_boxes[..., 3] - flat_boxes[..., 1]
        flat_valid = (
            flat_valid & (flat_scores > self.box_score_thresh) & (ws >= 1e-2) & (hs >= 1e-2)
        )

        # Fixed-size candidate pool, then class-wise NMS and final top-k.
        m = min(self.score_topk, flat_scores.shape[1])
        cand_scores, idx = jax.lax.top_k(jnp.where(flat_valid, flat_scores, -jnp.inf), m)
        cand_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
        cand_labels = jnp.take_along_axis(flat_labels, idx, axis=1)
        cand_valid = jnp.isfinite(cand_scores)
        keep = jax.vmap(
            lambda bx, sc, lb, v: batched_nms_keep(bx, sc, lb, v, self.box_nms_thresh)
        )(cand_boxes, jnp.where(cand_valid, cand_scores, 0.0), cand_labels, cand_valid)
        final_scores = jnp.where(keep & cand_valid, cand_scores, -jnp.inf)
        d = min(self.detections_per_img, final_scores.shape[1])
        top, idx = jax.lax.top_k(final_scores, d)
        return FRCNNDetections(
            boxes=jnp.take_along_axis(cand_boxes, idx[..., None], axis=1),
            labels=jnp.take_along_axis(cand_labels, idx, axis=1),
            scores=jnp.where(jnp.isfinite(top), top, 0.0),
            valid=jnp.isfinite(top),
        )


def clip_boxes(boxes: Array, hw: Array) -> Array:
    """Clip xyxy boxes to [0, w] x [0, h]; ``hw`` broadcasts as (h, w)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, hw[..., 1])
    y1 = jnp.clip(boxes[..., 1], 0.0, hw[..., 0])
    x2 = jnp.clip(boxes[..., 2], 0.0, hw[..., 1])
    y2 = jnp.clip(boxes[..., 3], 0.0, hw[..., 0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# --------------------------------------------------------------------------
# torchvision state_dict -> Flax variables
# --------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[name + ".weight"]), (2, 3, 1, 0))}
    if name + ".bias" in sd:
        out["bias"] = _np(sd[name + ".bias"])
    return out


def _linear(sd, name) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[name + ".weight"]).T, "bias": _np(sd[name + ".bias"])}


def _first(sd, *names: str) -> str:
    for n in names:
        if n + ".weight" in sd:
            return n
    raise KeyError(f"none of {names} in state dict")


def load_torch_fasterrcnn(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision ``fasterrcnn_resnet50_fpn`` state dict onto
    :class:`FasterRCNN` variables (params + batch_stats).

    Handles both key layouts: pre-0.13 (``rpn.head.conv.weight``,
    ``backbone.fpn.inner_blocks.0.weight``) and post-0.13
    (``rpn.head.conv.0.0.weight``, ``backbone.fpn.inner_blocks.0.0.weight``).
    """
    sd = state_dict
    body_params, body_stats = load_torch_resnet50(sd, prefix="backbone.body.")

    fpn: Dict[str, Any] = {}
    for i in range(4):
        inner = _first(sd, f"backbone.fpn.inner_blocks.{i}.0", f"backbone.fpn.inner_blocks.{i}")
        layer = _first(sd, f"backbone.fpn.layer_blocks.{i}.0", f"backbone.fpn.layer_blocks.{i}")
        fpn[f"lateral{i}"] = _conv(sd, inner)
        fpn[f"output{i}"] = _conv(sd, layer)

    rpn_conv = _first(sd, "rpn.head.conv.0.0", "rpn.head.conv")
    rpn = {
        "conv": _conv(sd, rpn_conv),
        "cls_logits": _conv(sd, "rpn.head.cls_logits"),
        "bbox_pred": _conv(sd, "rpn.head.bbox_pred"),
    }
    box_head = {
        "fc6": _linear(sd, "roi_heads.box_head.fc6"),
        "fc7": _linear(sd, "roi_heads.box_head.fc7"),
    }
    predictor = {
        "cls_score": _linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    params = {
        "body": body_params,
        "fpn": fpn,
        "rpn_head": rpn,
        "box_head": box_head,
        "box_predictor": predictor,
    }
    return {"params": params, "batch_stats": {"body": body_stats}}
