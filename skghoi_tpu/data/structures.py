"""Fixed-shape batch containers crossing the host -> device boundary.

The reference passes Python lists of ragged tensors plus per-image dicts
(``utils.py:34-42`` custom_collate keeps lists).  For TPU everything is padded
to static shapes on host and shipped as one pytree; validity masks carry the
ragged structure.  Boxes arrive already mapped into the resized-canvas
coordinate space (the host pipeline performs the reference's
``GeneralizedRCNNTransform`` resize, ``transforms.py:28-53``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

Array = jax.Array


class HOITargets(NamedTuple):
    """Padded ground-truth box pairs (keys mirror the reference targets)."""

    boxes_h: Array  # [B, G, 4]
    boxes_o: Array  # [B, G, 4]
    object: Array  # [B, G] object class of the object box
    labels: Array  # [B, G] verb class of the pair
    valid: Array  # [B, G] bool

    def as_dict(self) -> dict:
        return {
            "boxes_h": self.boxes_h,
            "boxes_o": self.boxes_o,
            "object": self.object,
            "labels": self.labels,
            "valid": self.valid,
        }


class HOIBatch(NamedTuple):
    images: Array  # [B, Hc, Wc, 3] float in [0, 1], padded canvas
    image_sizes: Array  # [B, 2] (h, w) of the resized image inside the canvas
    original_sizes: Array  # [B, 2] (h, w) pre-resize, for output rescaling
    det_boxes: Array  # [B, M, 4] cached detections in canvas space
    det_labels: Array  # [B, M]
    det_scores: Array  # [B, M]
    det_valid: Array  # [B, M] bool
    targets: Optional[HOITargets] = None
