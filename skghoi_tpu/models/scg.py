"""The full Spatially-Conditioned Graph HOI network.

Mirrors ``GenericHOINetwork``/``SpatiallyConditionedGraph``
(``models/adamixer_transH_spatial_r50_models.py:27-200``): image normalization
-> backbone -> FPN neck -> interaction head.  The whole forward — including
detection filtering (threshold/NMS/caps) and pair classification — is one
jittable function over an :class:`~skghoi_tpu.data.structures.HOIBatch`; the
only host-side steps are image decode/resize and the final per-image result
unpacking.

ImageNet normalization (``:193-198``) runs on device in the model dtype so XLA
folds it into the stem convolution.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from skghoi_tpu import constants as C
from skghoi_tpu.data.structures import HOIBatch
from skghoi_tpu.models.backbone import DetectorBackbone
from skghoi_tpu.models.interaction_head import (
    FilteredDetections,
    InteractionHead,
    InteractionOutputs,
    filter_detections,
)

Array = jax.Array


class SpatiallyConditionedGraph(nn.Module):
    num_classes: int = C.HICO_NUM_VERBS
    human_idx: int = C.HICO_HUMAN_IDX
    num_object: int = C.HICO_NUM_OBJECTS
    box_score_thresh: float = C.BOX_SCORE_THRESH
    box_nms_thresh: float = C.BOX_NMS_THRESH
    max_human: int = C.MAX_HUMAN
    max_object: int = C.MAX_OBJECT
    num_iterations: int = C.NUM_MP_ITERATIONS
    fg_iou_thresh: float = C.FG_IOU_THRESH
    feedback: bool = False
    quirk_box_index_tails: bool = False
    dtype: Any = jnp.float32
    # mmdet ResNet frozen_stages; the reference's mmdet-built backbone trains
    # with stem+layer1 frozen (public AdaMixer R50 configs, and mmdet's
    # detection default).  Freezing also removes ~1/3 of the train step: the
    # stem+layer1 backward at 832x1344 is the profile's top hotspot.
    frozen_stages: int = 1
    # Rematerialize backbone bottlenecks from this 1-based stage on (0 = off);
    # trades recompute FLOPs for activation HBM to unlock larger train batches.
    remat_stages: int = 0
    # Fold same-shape backbone tail blocks into nn.scan (compile-time lever,
    # see models/resnet.py; math-identical, A/B-able on the step time).
    scan_blocks: bool = True

    def setup(self):
        self.detector = DetectorBackbone(dtype=self.dtype, frozen_stages=self.frozen_stages,
                                         remat_stages=self.remat_stages,
                                         scan_blocks=self.scan_blocks)
        self.interaction_head = InteractionHead(
            num_cls=self.num_classes,
            human_idx=self.human_idx,
            num_object=self.num_object,
            num_iter=self.num_iterations,
            max_humans=self.max_human,
            fg_iou_thresh=self.fg_iou_thresh,
            feedback=self.feedback,
            quirk_box_index_tails=self.quirk_box_index_tails,
            dtype=self.dtype,
        )

    def __call__(
        self,
        batch: HOIBatch,
        object_verb_mask: Array,
        *,
        training: bool = False,
        rng: Optional[Array] = None,
    ) -> InteractionOutputs:
        mean = jnp.asarray(C.IMAGE_MEAN, self.dtype)
        std = jnp.asarray(C.IMAGE_STD, self.dtype)
        images = (batch.images.astype(self.dtype) - mean) / std

        features = self.detector(images)

        targets = batch.targets.as_dict() if batch.targets is not None else None
        detections: FilteredDetections = filter_detections(
            batch.det_boxes,
            batch.det_labels,
            batch.det_scores,
            batch.det_valid,
            human_idx=self.human_idx,
            box_score_thresh=self.box_score_thresh,
            box_nms_thresh=self.box_nms_thresh,
            max_human=self.max_human,
            max_object=self.max_object,
            # GT boxes join the candidate pool only in training (ref :104-116).
            targets=targets if training else None,
        )

        return self.interaction_head(
            features,
            detections,
            batch.image_sizes,
            object_verb_mask,
            targets,
            training=training,
            rng=rng,
        )

    def total_loss(self, outputs: InteractionOutputs) -> Array:
        """Sum of the three losses (engine semantics, ``utils.py:221``)."""
        assert outputs.losses is not None
        return sum(outputs.losses.values())
