"""RoIAlign vs a direct numpy oracle of torchvision semantics (aligned=False)."""

import numpy as np
import jax.numpy as jnp

from skghoi_tpu.ops import multiscale_roi_align, roi_align
from skghoi_tpu.ops.roi_align import fpn_level_assignment


def np_bilinear(fm, y, x):
    h, w = fm.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(fm.shape[2])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(np.floor(y)), int(np.floor(x))
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * fm[y_low, x_low]
        + hy * lx * fm[y_low, x_high]
        + ly * hx * fm[y_high, x_low]
        + ly * lx * fm[y_high, x_high]
    )


def np_roi_align(fm, box, scale, pooled, sr):
    x1, y1, x2, y2 = np.asarray(box, np.float64) * scale
    roi_w = max(x2 - x1, 1.0)
    roi_h = max(y2 - y1, 1.0)
    bin_w, bin_h = roi_w / pooled, roi_h / pooled
    out = np.zeros((pooled, pooled, fm.shape[2]))
    for ph in range(pooled):
        for pw in range(pooled):
            acc = np.zeros(fm.shape[2])
            for iy in range(sr):
                for ix in range(sr):
                    yy = y1 + (ph + (iy + 0.5) / sr) * bin_h
                    xx = x1 + (pw + (ix + 0.5) / sr) * bin_w
                    acc += np_bilinear(fm, yy, xx)
            out[ph, pw] = acc / (sr * sr)
    return out


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(0)
    fm = rng.normal(size=(24, 32, 5)).astype(np.float32)
    boxes = np.asarray(
        [
            [8.0, 4.0, 100.0, 80.0],
            [0.0, 0.0, 127.0, 95.0],
            [50.0, 50.0, 52.0, 53.0],  # tiny box -> clamped min size
            [-5.0, -5.0, 40.0, 40.0],  # partially out of bounds
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(fm), jnp.asarray(boxes), 0.25, 7, 2))
    for i, box in enumerate(boxes):
        want = np_roi_align(fm, box, 0.25, 7, 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_constant_map_pools_to_constant():
    fm = jnp.full((16, 16, 3), 2.5)
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    out = roi_align(fm, boxes, 0.25, 7, 2)
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-6)


def test_fpn_level_assignment():
    # Canonical 224x224 box -> level 4 -> index 2 (strides 4,8,16,32 = levels 2..5).
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 224.0, 224.0],
            [0.0, 0.0, 56.0, 56.0],   # sqrt area 56 -> level 2 -> index 0
            [0.0, 0.0, 112.0, 112.0], # level 3 -> index 1
            [0.0, 0.0, 448.0, 448.0], # level 5 -> index 3
            [0.0, 0.0, 4000.0, 4000.0],  # clamped to 3
            [0.0, 0.0, 1.0, 1.0],     # clamped to 0
        ]
    )
    got = np.asarray(fpn_level_assignment(boxes))
    assert got.tolist() == [2, 0, 1, 3, 3, 0]


def test_multiscale_selects_levels():
    rng = np.random.default_rng(1)
    maps = [
        jnp.asarray(rng.normal(size=(64 // s, 64 // s, 4)).astype(np.float32) + lvl)
        for lvl, s in enumerate((4, 8, 16, 32))
    ]
    boxes = jnp.asarray([[0.0, 0.0, 56.0, 56.0], [0.0, 0.0, 448.0, 448.0]])
    out = multiscale_roi_align(maps, boxes)
    assert out.shape == (2, 7, 7, 4)
    # Each box pooled from its assigned level only: verify against single-level call.
    lvls = np.asarray(fpn_level_assignment(boxes))
    for i, lvl in enumerate(lvls):
        single = roi_align(maps[lvl], boxes[i : i + 1], 1.0 / (4 * 2**lvl), 7, 2)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(single[0]), rtol=1e-5)
