"""Datasets (HICO-DET / V-COCO), detection caches, and the padding pipeline."""

from skghoi_tpu.data.structures import HOIBatch, HOITargets

__all__ = ["HOIBatch", "HOITargets"]
