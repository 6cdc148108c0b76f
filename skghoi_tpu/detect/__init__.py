"""Stage-1 detection tools: cache generation + detection-quality evaluation."""

from skghoi_tpu.detect.generate import generate_gt_detections
from skghoi_tpu.detect.eval_detections import compute_detection_map

__all__ = ["generate_gt_detections", "compute_detection_map"]
