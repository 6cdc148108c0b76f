"""skghoi_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the SKGHOI framework.

SKGHOI ("Spatial Knowledge-Graph HOI") is a two-stage human-object-interaction
detector: a frozen detector backbone produces per-image object detections, and a
spatially-conditioned graph network augmented with TransH knowledge-graph
embeddings classifies every human-object pair into verb classes.

This package is a ground-up TPU-first re-design (reference: lijingzhu1/SKGHOI,
mounted read-only during development):

- fixed padded shapes everywhere (detections, pairs, verbs) so the whole model
  compiles once under ``jax.jit``,
- the per-image Python loops of the reference's GraphHead become batched masked
  tensor ops that map onto the MXU,
- DDP/NCCL is replaced by ``jax.sharding`` meshes + XLA collectives,
- the OpenKE KGE toolkit (incl. its C++ sampling backend) is rebuilt with both a
  native C++ library (same ``extern "C"`` surface) and an in-graph JAX sampler.

Sub-packages
------------
ops        low-level numerics: boxes/NMS, spatial encodings, losses, RoIAlign, AP meters
models     ResNet50+FPN backbone, graph head, interaction head, full SCG network
kge        OpenKE-parity knowledge-graph-embedding toolkit (TransE..HolE) + native base
data       HICO-DET / V-COCO datasets, detection-cache IO, padding pipeline
parallel   device mesh + sharded train/eval steps
train      learning engine, optimizer/schedule, checkpointing
eval       HOI mAP evaluation, official-format result caching (.mat / vcoco pkl)
detect     stage-1 detection cache generation + detection mAP evaluation
"""

__version__ = "0.1.0"
