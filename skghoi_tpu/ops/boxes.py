"""Bounding-box numerics with fixed shapes, designed for ``jax.jit``.

The reference relies on ``torchvision.ops.boxes`` (box_iou, batched_nms) with
ragged per-image tensors (reference ``heads/adamixer_transH_spatial_r50_head.py:119-142``).
On TPU, data-dependent shapes force recompilation, so every function here takes
padded arrays plus a validity mask and returns fixed-shape results.  NMS is a
greedy sweep expressed as ``lax.fori_loop`` over a precomputed IoU matrix —
O(N) vectorized steps, which for N<=160 is far below the cost of one backbone
conv layer.

Boxes use ``(x1, y1, x2, y2)`` corner format in continuous coordinates, the
same convention as torchvision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_NEG_INF = -1e30


def box_area(boxes: Array) -> Array:
    """Area of ``[..., 4]`` boxes (torchvision convention: no +1)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise IoU between ``[N, 4]`` and ``[M, 4]`` boxes -> ``[N, M]``.

    Matches ``torchvision.ops.boxes.box_iou`` semantics (used by the reference
    for GT association, ``heads/...head.py:711-714``, and inside the spatial
    encodings, ``ops.py:119``).  Degenerate/padded boxes with zero area yield 0.
    """
    area1 = box_area(boxes1)  # [N]
    area2 = box_area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N, M, 2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N, M, 2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def elementwise_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """IoU of corresponding boxes, ``[..., 4] x [..., 4] -> [...]``.

    The reference computes ``torch.diag(box_iou(b1, b2))`` (``ops.py:119``);
    this computes only the diagonal, batched over any leading dims.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def nms_keep(
    boxes: Array,
    scores: Array,
    valid: Array,
    iou_threshold: float,
) -> Array:
    """Greedy NMS over padded boxes; returns a boolean keep mask ``[N]``.

    Semantics match ``torchvision.ops.nms``: boxes are visited in descending
    score order and a box is suppressed iff its IoU with an already-kept box is
    strictly greater than ``iou_threshold``.  Invalid (padding) entries are
    never kept and never suppress anything.

    The greedy data dependence is sequential by nature, so it runs as a
    ``fori_loop`` of N vectorized steps over a precomputed ``[N, N]`` IoU
    matrix (one VPU-friendly reduction per step).
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-masked_scores)  # descending; invalid entries last
    sboxes = boxes[order]
    svalid = valid[order]

    iou = box_iou(sboxes, sboxes)
    suppress = iou > iou_threshold  # [i, j]: i suppresses j
    idx = jnp.arange(n)

    def body(i, keep):
        # Is box i suppressed by any kept, higher-scoring box?
        suppressed = jnp.any(keep & (idx < i) & suppress[:, i])
        return keep.at[i].set(keep[i] & ~suppressed)

    keep_sorted = lax.fori_loop(0, n, body, svalid)
    # Scatter keep decisions back to the original order.
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep


def batched_nms_keep(
    boxes: Array,
    scores: Array,
    labels: Array,
    valid: Array,
    iou_threshold: float,
) -> Array:
    """Class-wise NMS via the coordinate-offset trick; returns keep mask ``[N]``.

    Equivalent to ``torchvision.ops.batched_nms`` (reference
    ``heads/...head.py:123-128``): boxes of different classes never suppress
    each other.  Each class's boxes are shifted to a disjoint region of the
    plane, then plain NMS runs once over all boxes.
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    return nms_keep(shifted, scores, valid, iou_threshold)


def resize_boxes(boxes: Array, original_size, new_size) -> Array:
    """Scale ``[..., 4]`` boxes from ``original_size`` to ``new_size`` (h, w).

    Mirrors ``torchvision.models.detection.transform.resize_boxes`` used by the
    reference when mapping detections into the resized image space
    (``models/...models.py:62-67``) and back (``transforms.py:55-68``).
    Sizes may be Python ints or traced scalars.
    """
    oh, ow = original_size
    nh, nw = new_size
    ratio_w = jnp.asarray(nw, boxes.dtype) / jnp.asarray(ow, boxes.dtype)
    ratio_h = jnp.asarray(nh, boxes.dtype) / jnp.asarray(oh, boxes.dtype)
    scale = jnp.stack([ratio_w, ratio_h, ratio_w, ratio_h])
    return boxes * scale


def hflip_boxes(boxes: Array, width) -> Array:
    """Horizontally flip ``[..., 4]`` boxes within an image of given ``width``.

    Counterpart of ``pocket.ops.horizontal_flip_boxes`` used by the data
    augmentation (reference ``utils.py:115-118``).
    """
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = jnp.asarray(width, boxes.dtype)
    return jnp.concatenate([w - x2, y1, w - x1, y2], axis=-1)
