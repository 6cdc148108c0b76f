"""RoIAlign for TPU: gather-based bilinear sampling over FPN feature maps.

Replaces ``torchvision.ops.MultiScaleRoIAlign`` as configured by the reference
(``models/adamixer_transH_spatial_r50_models.py:158-162``: feature maps
'0'..'3', output 7x7, sampling_ratio 2).  Semantics match torchvision's
``roi_align`` with ``aligned=False`` (the torchvision default used there):

  * RoI corners are scaled by ``spatial_scale``; width/height are clamped to a
    minimum of 1 feature cell,
  * each output bin is sampled on a ``sampling_ratio x sampling_ratio`` grid at
    offsets ``(i + 0.5)/sr`` of the bin and the samples are averaged,
  * bilinear interpolation treats pixel centres as integer coordinates, returns
    0 outside ``[-1, size]`` and clamps the border otherwise,
  * FPN level per box: ``floor(4 + log2(sqrt(area)/224 + 1e-6))`` clamped to
    ``[2, 5]`` (torchvision ``LevelMapper`` defaults).

Design: everything is dense and fixed-shape.  For N padded boxes we compute the
pooled output at *all* FPN levels and select per box — with N<=30 boxes of
7x7x256 output this is ~6 MB of gathers per level, negligible next to one
backbone stage, and it keeps the op free of data-dependent shapes.  Feature
maps are NHWC (the natural TPU layout).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_sample(features: Array, y: Array, x: Array) -> Array:
    """Sample ``features [H, W, C]`` at continuous coords ``y, x [...]`` -> ``[..., C]``.

    Implements torchvision's ``bilinear_interpolate``: zero outside
    ``(-1, size)``, clamp-to-edge inside.
    """
    h, w = features.shape[0], features.shape[1]
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)

    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    # Border handling: at the far edge both corners collapse to the last cell
    # and the fractional part is recomputed against the clamped low corner.
    y_low = jnp.minimum(y_low, h - 1)
    x_low = jnp.minimum(x_low, w - 1)
    y = jnp.minimum(y, jnp.asarray(h - 1, y.dtype))
    x = jnp.minimum(x, jnp.asarray(w - 1, x.dtype))
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)

    ly = y - y_low.astype(y.dtype)
    lx = x - x_low.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    v00 = features[y_low, x_low]
    v01 = features[y_low, x_high]
    v10 = features[y_high, x_low]
    v11 = features[y_high, x_high]

    out = (
        (hy * hx)[..., None] * v00
        + (hy * lx)[..., None] * v01
        + (ly * hx)[..., None] * v10
        + (ly * lx)[..., None] * v11
    )
    return jnp.where(oob[..., None], 0.0, out)


def roi_align(
    features: Array,
    boxes: Array,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Array:
    """RoIAlign one feature level.

    Args:
      features: ``[H, W, C]`` feature map.
      boxes: ``[N, 4]`` boxes in input-image coordinates (x1, y1, x2, y2).
      spatial_scale: feature stride reciprocal (e.g. 0.25 for stride-4).
      output_size: pooled spatial resolution (7 in the reference).
      sampling_ratio: samples per bin side (2 in the reference).

    Returns:
      ``[N, output_size, output_size, C]`` pooled features.
    """
    n = boxes.shape[0]
    ph = pw = output_size
    sr = sampling_ratio

    x1 = boxes[:, 0] * spatial_scale
    y1 = boxes[:, 1] * spatial_scale
    x2 = boxes[:, 2] * spatial_scale
    y2 = boxes[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    # Sample grid offsets within a bin: (i + 0.5)/sr for i in [0, sr).
    off = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr  # [sr]
    bins_y = jnp.arange(ph, dtype=jnp.float32)  # [ph]
    bins_x = jnp.arange(pw, dtype=jnp.float32)  # [pw]

    # y coords: [N, ph, sr] ; x coords: [N, pw, sr]
    ys = y1[:, None, None] + (bins_y[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins_x[None, :, None] + off[None, None, :]) * bin_w[:, None, None]

    # Full sample lattice [N, ph, sr, pw, sr]
    y_grid = jnp.broadcast_to(ys[:, :, :, None, None], (n, ph, sr, pw, sr))
    x_grid = jnp.broadcast_to(xs[:, None, None, :, :], (n, ph, sr, pw, sr))

    samples = _bilinear_sample(features, y_grid, x_grid)  # [N, ph, sr, pw, sr, C]
    return samples.mean(axis=(2, 4))  # average the sr*sr samples per bin


def fpn_level_assignment(
    boxes: Array,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    k_min: int = 2,
    k_max: int = 5,
    eps: float = 1e-6,
) -> Array:
    """torchvision ``LevelMapper``: box -> FPN level index in ``[0, k_max-k_min]``."""
    area = jnp.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 0.0, None
    )
    s = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multiscale_roi_align(
    feature_maps: Sequence[Array],
    boxes: Array,
    strides: Sequence[int] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Array:
    """Multi-scale RoIAlign over FPN levels with per-box level selection.

    Computes the pooled output at every level (static shapes; levels is a
    compile-time constant) and gathers the assigned level per box.

    Args:
      feature_maps: list of ``[H_l, W_l, C]`` maps, finest first.
      boxes: ``[N, 4]`` padded boxes in input-image coordinates.

    Returns:
      ``[N, output_size, output_size, C]``
    """
    levels = fpn_level_assignment(boxes)  # [N]
    pooled = jnp.stack(
        [
            roi_align(fm, boxes, 1.0 / s, output_size, sampling_ratio)
            for fm, s in zip(feature_maps, strides)
        ]
    )  # [L, N, ph, pw, C]
    n = boxes.shape[0]
    return pooled[levels, jnp.arange(n)]  # [N, ph, pw, C]
