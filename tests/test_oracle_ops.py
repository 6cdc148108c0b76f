"""Oracle-twin torch ops vs the JAX ops layer: same math, two frameworks."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from skghoi_tpu.oracle import ops as tops
from skghoi_tpu.ops.boxes import batched_nms_keep
from skghoi_tpu.ops.losses import binary_focal_loss
from skghoi_tpu.ops.roi_align import multiscale_roi_align
from skghoi_tpu.ops.spatial import compute_spatial_ratio_encodings


def random_boxes(rng, n, h=256, w=384):
    xy = rng.uniform(0, [w - 40, h - 40], (n, 2))
    wh = rng.uniform(8, 150, (n, 2))
    return np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1).astype(np.float32)


def test_oracle_batched_nms_matches_jax():
    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0.01, 1.0, 40).astype(np.float32)
    labels = rng.integers(0, 5, 40)
    keep_t = tops.batched_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores), torch.from_numpy(labels), 0.5
    ).numpy()
    keep_j = np.asarray(
        batched_nms_keep(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.ones(40, bool), 0.5,
        )
    )
    assert set(keep_t.tolist()) == set(np.nonzero(keep_j)[0].tolist())


def test_oracle_roi_align_matches_jax():
    rng = np.random.default_rng(1)
    fms_hwc = [rng.normal(size=(256 // s, 384 // s, 8)).astype(np.float32) for s in (4, 8, 16, 32)]
    boxes = random_boxes(rng, 12)
    want = np.asarray(multiscale_roi_align(tuple(jnp.asarray(f) for f in fms_hwc), jnp.asarray(boxes)))
    got = tops.multiscale_roi_align(
        [torch.from_numpy(f).permute(2, 0, 1) for f in fms_hwc], torch.from_numpy(boxes)
    ).numpy()  # [N, C, 7, 7]
    got_hwc = np.transpose(got, (0, 2, 3, 1))
    np.testing.assert_allclose(got_hwc, want, rtol=1e-4, atol=1e-5)


def test_oracle_spatial_encodings_match_jax():
    rng = np.random.default_rng(2)
    b1 = random_boxes(rng, 20)
    b2 = random_boxes(rng, 20)
    want = np.asarray(
        compute_spatial_ratio_encodings(jnp.asarray(b1), jnp.asarray(b2), 256.0, 384.0)
    )
    got = tops.compute_spatial_ratio_encodings(
        [torch.from_numpy(b1)], [torch.from_numpy(b2)], [(256, 384)]
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_oracle_focal_matches_jax():
    rng = np.random.default_rng(3)
    x = rng.uniform(0.01, 0.99, (50, 7)).astype(np.float32)
    y = (rng.random((50, 7)) < 0.3).astype(np.float32)
    want = float(binary_focal_loss(jnp.asarray(x), jnp.asarray(y), gamma=0.2, reduction="sum"))
    got = float(tops.binary_focal_loss(torch.from_numpy(x), torch.from_numpy(y),
                                       gamma=0.2, reduction="sum"))
    np.testing.assert_allclose(got, want, rtol=1e-4)
