"""Pairwise spatial-ratio encodings (46-d) for human-object box pairs.

Reimplements the exact feature set of the reference's
``compute_spatial_ratio_encodings`` (``ops.py:85-157``): 23 raw geometric
features per pair followed by their elementwise ``log(f + eps)``.

Unlike the reference, which loops over a list of per-image ragged tensors, this
version is fully batched: it accepts boxes with arbitrary leading dimensions
(e.g. ``[B, P, 4]`` padded pair tensors) and broadcastable image shapes, so a
whole batch of pair grids is encoded in one fused XLA op.  The reference's
NaN guard (``heads/...head.py:866-868`` applies ``nan_to_num``) is built in:
padded zero boxes produce finite encodings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skghoi_tpu.constants import SPATIAL_EPS, SPATIAL_FEATURE_SIZE
from skghoi_tpu.ops.boxes import elementwise_box_iou

Array = jax.Array


def compute_spatial_ratio_encodings(
    boxes_1: Array,
    boxes_2: Array,
    image_heights: Array,
    image_widths: Array,
    eps: float = SPATIAL_EPS,
) -> Array:
    """Compute 46-d spatial encodings for corresponding box pairs.

    Args:
      boxes_1: ``[..., 4]`` human boxes (x1, y1, x2, y2).
      boxes_2: ``[..., 4]`` object boxes.
      image_heights: scalar or array broadcastable to the leading dims.
      image_widths: scalar or array broadcastable to the leading dims.
      eps: numerical-stability constant (reference ``ops.py:87`` uses 1e-10).

    Returns:
      ``[..., 46]`` float32 encodings: 23 features and their logs, in the exact
      order of reference ``ops.py:134-156``.
    """
    b1 = boxes_1.astype(jnp.float32)
    b2 = boxes_2.astype(jnp.float32)
    # Support broadcastable leading dims (e.g. [B, H, 1, 4] x [B, 1, N, 4]
    # meshgrid-style pairing) by broadcasting to the common shape first.
    shape = jnp.broadcast_shapes(b1.shape, b2.shape)
    b1 = jnp.broadcast_to(b1, shape)
    b2 = jnp.broadcast_to(b2, shape)
    h = jnp.asarray(image_heights, jnp.float32)
    w = jnp.asarray(image_widths, jnp.float32)

    c1_x = (b1[..., 0] + b1[..., 2]) / 2
    c1_y = (b1[..., 1] + b1[..., 3]) / 2
    c2_x = (b2[..., 0] + b2[..., 2]) / 2
    c2_y = (b2[..., 1] + b2[..., 3]) / 2

    b1_w = b1[..., 2] - b1[..., 0]
    b1_h = b1[..., 3] - b1[..., 1]
    b2_w = b2[..., 2] - b2[..., 0]
    b2_h = b2[..., 3] - b2[..., 1]

    d_x = jnp.abs(c2_x - c1_x) / (b1_w + eps)
    d_y = jnp.abs(c2_y - c1_y) / (b1_h + eps)

    iou = elementwise_box_iou(b1, b2)

    c1_xw = c1_x / w
    c1_yh = c1_y / h
    c2_xw = c2_x / w
    c2_yh = c2_y / h
    b1_ww = b1_w / w
    b1_hh = b1_h / h
    b2_ww = b2_w / w
    b2_hh = b2_h / h
    box1_area = b1_w * b1_h / (h * w)
    box2_area = b2_w * b2_h / (h * w)
    box1_ratio = b1_w / (b1_h + eps)
    box2_ratio = b2_w / (b2_h + eps)

    f = jnp.stack(
        [
            # Relative position of box centres
            c1_xw,
            c1_yh,
            c2_xw,
            c2_yh,
            c1_xw / (c2_xw + eps),
            c1_yh / (c2_yh + eps),
            # Relative box width and height
            b1_ww,
            b1_hh,
            b2_ww,
            b2_hh,
            b1_ww / (b2_ww + eps),
            b1_hh / (b2_hh + eps),
            # Relative box area
            box1_area,
            box2_area,
            box1_area / (box2_area + eps),
            b2_w * b2_h / (b1_w * b1_h + eps),
            # Box aspect ratio
            box1_ratio,
            box2_ratio,
            # Intersection over union
            iou,
            # Relative distance and direction of the object w.r.t. the person
            (c2_x > c1_x).astype(jnp.float32) * d_x,
            (c2_x < c1_x).astype(jnp.float32) * d_x,
            (c2_y > c1_y).astype(jnp.float32) * d_y,
            (c2_y < c1_y).astype(jnp.float32) * d_y,
        ],
        axis=-1,
    )

    out = jnp.concatenate([f, jnp.log(f + eps)], axis=-1)
    # Built-in analogue of the reference's nan_to_num guard: padded/degenerate
    # boxes must not poison the batch.
    out = jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)
    assert out.shape[-1] == SPATIAL_FEATURE_SIZE
    return out
