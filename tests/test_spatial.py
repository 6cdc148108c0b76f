"""Spatial-ratio encodings vs a hand-computed numpy oracle."""

import numpy as np
import jax.numpy as jnp

from skghoi_tpu.ops import compute_spatial_ratio_encodings

EPS = 1e-10


def np_spatial(b1, b2, h, w):
    """Independent transcription of the 46-d feature list (SURVEY.md §2.4)."""
    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    c1x, c1y = (b1[0] + b1[2]) / 2, (b1[1] + b1[3]) / 2
    c2x, c2y = (b2[0] + b2[2]) / 2, (b2[1] + b2[3]) / 2
    w1, h1 = b1[2] - b1[0], b1[3] - b1[1]
    w2, h2 = b2[2] - b2[0], b2[3] - b2[1]
    dx = abs(c2x - c1x) / (w1 + EPS)
    dy = abs(c2y - c1y) / (h1 + EPS)
    iw = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
    ih = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
    inter = iw * ih
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / union if union > 0 else 0.0
    a1, a2 = w1 * h1 / (h * w), w2 * h2 / (h * w)
    f = [
        c1x / w, c1y / h, c2x / w, c2y / h,
        (c1x / w) / (c2x / w + EPS), (c1y / h) / (c2y / h + EPS),
        w1 / w, h1 / h, w2 / w, h2 / h,
        (w1 / w) / (w2 / w + EPS), (h1 / h) / (h2 / h + EPS),
        a1, a2, a1 / (a2 + EPS), w2 * h2 / (w1 * h1 + EPS),
        w1 / (h1 + EPS), w2 / (h2 + EPS),
        iou,
        float(c2x > c1x) * dx, float(c2x < c1x) * dx,
        float(c2y > c1y) * dy, float(c2y < c1y) * dy,
    ]
    f = np.asarray(f)
    return np.concatenate([f, np.log(f + EPS)])


def test_values_match_oracle():
    b1 = [10.0, 20.0, 110.0, 220.0]
    b2 = [50.0, 30.0, 90.0, 170.0]
    h, w = 480, 640
    got = np.asarray(
        compute_spatial_ratio_encodings(
            jnp.asarray([b1]), jnp.asarray([b2]), h, w
        )
    )[0]
    want = np_spatial(b1, b2, h, w)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_batched_shape_and_finiteness():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 400, (3, 450, 2)).astype(np.float32)
    wh = rng.uniform(1, 200, (3, 450, 2)).astype(np.float32)
    b1 = np.concatenate([xy, xy + wh], -1)
    b2 = np.roll(b1, 1, axis=1)
    out = compute_spatial_ratio_encodings(
        jnp.asarray(b1), jnp.asarray(b2),
        jnp.asarray([480.0, 500.0, 520.0])[:, None],
        jnp.asarray([640.0, 600.0, 700.0])[:, None],
    )
    assert out.shape == (3, 450, 46)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_padded_zero_boxes_are_finite():
    z = jnp.zeros((4, 4))
    out = compute_spatial_ratio_encodings(z, z, 800, 1333)
    assert bool(jnp.all(jnp.isfinite(out)))
