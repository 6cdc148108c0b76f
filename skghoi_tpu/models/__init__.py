"""Model layer: detector backbone, graph/interaction heads, full SCG network."""

from skghoi_tpu.models.resnet import ResNet50
from skghoi_tpu.models.fpn import FPN
from skghoi_tpu.models.backbone import DetectorBackbone
from skghoi_tpu.models.mbf import MultiBranchFusion
from skghoi_tpu.models.graph_head import GraphHead, GraphHeadOutputs
from skghoi_tpu.models.interaction_head import (
    InteractionHead,
    InteractionOutputs,
    filter_detections,
)
from skghoi_tpu.models.scg import SpatiallyConditionedGraph

__all__ = [
    "ResNet50",
    "FPN",
    "DetectorBackbone",
    "MultiBranchFusion",
    "GraphHead",
    "GraphHeadOutputs",
    "InteractionHead",
    "InteractionOutputs",
    "filter_detections",
    "SpatiallyConditionedGraph",
]
