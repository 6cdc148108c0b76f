"""Plain-torch reimplementations of the torchvision/reference ops the twin
needs: box IoU, (batched) NMS, box resizing, multi-scale RoIAlign, the 46-d
spatial-ratio encodings, and binary focal loss.

Semantics sources:
- NMS / batched NMS: torchvision ``ops.boxes.nms/batched_nms`` (greedy,
  IoU strictly-greater suppression, class-offset trick).
- RoIAlign: torchvision ``ops.roi_align`` with ``aligned=False`` — the
  configuration ``MultiScaleRoIAlign`` uses in the reference
  (``models/adamixer_transH_spatial_r50_models.py:159-163``).
- Level assignment: torchvision ``LevelMapper`` (canonical scale 224, level 4,
  eps 1e-6), the mapper MultiScaleRoIAlign builds.
- Spatial encodings / focal loss: reference ``ops.py:85-157,159-211``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor


def box_area(boxes: Tensor) -> Tensor:
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1: Tensor, boxes2: Tensor) -> Tensor:
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union


def nms(boxes: Tensor, scores: Tensor, iou_threshold: float) -> Tensor:
    """Greedy NMS; keeps boxes whose IoU with every kept higher-scoring box is
    <= threshold (torchvision suppresses on strictly greater)."""
    order = torch.argsort(scores, descending=True)
    keep: List[int] = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    ious = box_iou(boxes, boxes)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= ious[i] > iou_threshold
        suppressed[i] = True  # self-IoU is 1; keep it marked but already kept
    return torch.as_tensor(keep, dtype=torch.int64)


def batched_nms(boxes: Tensor, scores: Tensor, idxs: Tensor, iou_threshold: float) -> Tensor:
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    return nms(boxes + offsets[:, None], scores, iou_threshold)


def resize_boxes(boxes: Tensor, original_size, new_size) -> Tensor:
    """torchvision ``transform.resize_boxes``."""
    ratio_h = torch.tensor(new_size[0], dtype=torch.float32) / torch.tensor(
        original_size[0], dtype=torch.float32
    )
    ratio_w = torch.tensor(new_size[1], dtype=torch.float32) / torch.tensor(
        original_size[1], dtype=torch.float32
    )
    xmin, ymin, xmax, ymax = boxes.unbind(1)
    return torch.stack(
        (xmin * ratio_w, ymin * ratio_h, xmax * ratio_w, ymax * ratio_h), dim=1
    )


def roi_align_single(
    feature: Tensor,  # [C, H, W]
    rois: Tensor,  # [N, 4] (x1, y1, x2, y2) in image coords
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Tensor:
    """torchvision ``roi_align`` (aligned=False) on one feature map.

    Returns [N, C, P, P].  Sample positions outside [-1, size] contribute
    zero; in-range positions clamp to the valid grid (edge replication).
    """
    c, h, w = feature.shape
    n = rois.shape[0]
    p, sr = output_size, sampling_ratio
    if n == 0:
        return feature.new_zeros(0, c, p, p)

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    roi_w = (rois[:, 2] * spatial_scale - x1).clamp(min=1.0)
    roi_h = (rois[:, 3] * spatial_scale - y1).clamp(min=1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # Sample positions per axis: [N, P * sr]
    grid = torch.arange(p * sr, dtype=torch.float32)
    offs = torch.floor(grid / sr) + (grid % sr + 0.5) / sr
    ys = y1[:, None] + offs[None, :] * bin_h[:, None]
    xs = x1[:, None] + offs[None, :] * bin_w[:, None]

    def axis_gather(pos, size):
        oob = (pos < -1.0) | (pos > float(size))
        pc = pos.clamp(0.0, float(size) - 1.0)
        lo = pc.floor().long()
        hi = (lo + 1).clamp(max=int(size) - 1)
        frac = pc - lo
        return lo, hi, frac, oob

    ylo, yhi, fy, oob_y = axis_gather(ys, float(h))
    xlo, xhi, fx, oob_x = axis_gather(xs, float(w))

    ny = ylo.shape[1]

    def sample(yy, xx):
        # yy: [N, ny], xx: [N, nx] -> values [N, C, ny, nx]
        rows = feature[:, yy, :].permute(1, 0, 2, 3)  # [N, C, ny, W]
        return torch.gather(rows, 3, xx[:, None, None, :].expand(n, c, ny, xx.shape[1]))

    v00 = sample(ylo, xlo)
    v01 = sample(ylo, xhi)
    v10 = sample(yhi, xlo)
    v11 = sample(yhi, xhi)

    fy_b = fy[:, None, :, None]
    fx_b = fx[:, None, None, :]
    val = (
        v00 * (1 - fy_b) * (1 - fx_b)
        + v01 * (1 - fy_b) * fx_b
        + v10 * fy_b * (1 - fx_b)
        + v11 * fy_b * fx_b
    )
    val = val * (~oob_y)[:, None, :, None] * (~oob_x)[:, None, None, :]

    # Average the sr x sr samples of each bin.
    val = val.reshape(n, c, p, sr, p, sr)
    return val.mean(dim=(3, 5))


def fpn_level_assignment(
    boxes: Tensor,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    k_min: int = 2,
    k_max: int = 5,
    eps: float = 1e-6,
) -> Tensor:
    """torchvision ``LevelMapper``: level index 0..3 over P2..P5."""
    s = torch.sqrt(box_area(boxes))
    lvl = torch.floor(canonical_level + torch.log2(s / canonical_scale + eps))
    return (lvl.clamp(min=k_min, max=k_max) - k_min).long()


def multiscale_roi_align(
    features: Sequence[Tensor],  # four [C, H_l, W_l], finest first
    rois: Tensor,  # [N, 4]
    strides: Sequence[int] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Tensor:
    """torchvision ``MultiScaleRoIAlign`` over one image's pyramid."""
    n = rois.shape[0]
    c = features[0].shape[0]
    out = features[0].new_zeros(n, c, output_size, output_size)
    if n == 0:
        return out
    levels = fpn_level_assignment(rois)
    for l, (fm, stride) in enumerate(zip(features, strides)):
        sel = torch.nonzero(levels == l).squeeze(1)
        if len(sel):
            out[sel] = roi_align_single(
                fm, rois[sel], 1.0 / stride, output_size, sampling_ratio
            )
    return out


def compute_spatial_ratio_encodings(
    boxes_1: List[Tensor],
    boxes_2: List[Tensor],
    shapes: List[Tuple[int, int]],
    eps: float = 1e-10,
) -> Tensor:
    """Reference ``ops.py:85-157`` verbatim semantics: 23 ratio features and
    their logs -> 46-d encodings."""
    features = []
    for b1, b2, shape in zip(boxes_1, boxes_2, shapes):
        h, w = shape
        c1_x = (b1[:, 0] + b1[:, 2]) / 2
        c1_y = (b1[:, 1] + b1[:, 3]) / 2
        c2_x = (b2[:, 0] + b2[:, 2]) / 2
        c2_y = (b2[:, 1] + b2[:, 3]) / 2
        b1_w = b1[:, 2] - b1[:, 0]
        b1_h = b1[:, 3] - b1[:, 1]
        b2_w = b2[:, 2] - b2[:, 0]
        b2_h = b2[:, 3] - b2[:, 1]
        d_x = torch.abs(c2_x - c1_x) / (b1_w + eps)
        d_y = torch.abs(c2_y - c1_y) / (b1_h + eps)
        iou = torch.diag(box_iou(b1, b2))
        c1_xw, c1_yh = c1_x / w, c1_y / h
        c2_xw, c2_yh = c2_x / w, c2_y / h
        b1_ww, b1_hh = b1_w / w, b1_h / h
        b2_ww, b2_hh = b2_w / w, b2_h / h
        box1_area = b1_w * b1_h / (h * w)
        box2_area = b2_w * b2_h / (h * w)
        box1_ratio = b1_w / (b1_h + eps)
        box2_ratio = b2_w / (b2_h + eps)
        f = torch.stack(
            [
                c1_xw, c1_yh, c2_xw, c2_yh,
                c1_xw / (c2_xw + eps), c1_yh / (c2_yh + eps),
                b1_ww, b1_hh, b2_ww, b2_hh,
                b1_ww / (b2_ww + eps), b1_hh / (b2_hh + eps),
                box1_area, box2_area,
                box1_area / (box2_area + eps),
                b2_w * b2_h / (b1_w * b1_h + eps),
                box1_ratio, box2_ratio,
                iou,
                (c2_x > c1_x).float() * d_x,
                (c2_x < c1_x).float() * d_x,
                (c2_y > c1_y).float() * d_y,
                (c2_y < c1_y).float() * d_y,
            ],
            1,
        )
        features.append(torch.cat([f, torch.log(f + eps)], 1))
    return torch.cat(features)


def binary_focal_loss(
    x: Tensor,
    y: Tensor,
    alpha: float = 0.5,
    gamma: float = 2.0,
    reduction: str = "mean",
    eps: float = 1e-6,
) -> Tensor:
    """Reference ``ops.py:159-211``."""
    loss = (1 - y - alpha).abs() * ((y - x).abs() + eps) ** gamma * F.binary_cross_entropy(
        x, y, reduction="none"
    )
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"Unsupported reduction method {reduction}")
