"""Low-level TPU-friendly numerics: box ops, spatial encodings, losses, RoIAlign."""

from skghoi_tpu.ops.boxes import (
    box_area,
    box_iou,
    elementwise_box_iou,
    nms_keep,
    batched_nms_keep,
    resize_boxes,
    hflip_boxes,
)
from skghoi_tpu.ops.spatial import compute_spatial_ratio_encodings
from skghoi_tpu.ops.losses import (
    binary_focal_loss,
    binary_focal_loss_with_logits,
    margin_ranking_loss,
)
from skghoi_tpu.ops.roi_align import roi_align, multiscale_roi_align

__all__ = [
    "box_area",
    "box_iou",
    "elementwise_box_iou",
    "nms_keep",
    "batched_nms_keep",
    "resize_boxes",
    "hflip_boxes",
    "compute_spatial_ratio_encodings",
    "binary_focal_loss",
    "binary_focal_loss_with_logits",
    "margin_ranking_loss",
    "roi_align",
    "multiscale_roi_align",
]
