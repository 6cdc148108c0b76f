"""Torch-CPU "oracle twin" of the reference stage-2 pipeline.

A faithful plain-torch (no torchvision/mmdet) reimplementation of the
reference's ragged per-image HOI forward — transform -> ResNet50+FPN ->
MultiScaleRoIAlign -> GraphHead -> InteractionHead postprocess
(``/root/reference/models/adamixer_transH_spatial_r50_models.py``,
``/root/reference/heads/adamixer_transH_spatial_r50_head.py``,
``/root/reference/transforms.py``).  Its module tree matches the reference
checkpoint's ``model_state_dict`` key families, so real checkpoints load with
``load_state_dict`` and :mod:`skghoi_tpu.oracle.convert` maps the same weights
onto the Flax model — turning "we believe the semantics match" into a
score-level assertion (``tests/test_reference_parity.py``).

Torch-only: importing this package must not pull in JAX.
"""
