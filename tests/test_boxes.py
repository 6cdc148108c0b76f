"""Box ops vs independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from skghoi_tpu.ops import (
    batched_nms_keep,
    box_iou,
    elementwise_box_iou,
    hflip_boxes,
    nms_keep,
    resize_boxes,
)


def np_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, (ax1, ay1, ax2, ay2) in enumerate(a):
        for j, (bx1, by1, bx2, by2) in enumerate(b):
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def np_nms(boxes, scores, iou_threshold):
    """Greedy NMS, torchvision semantics (suppress when IoU > thresh)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if np_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > iou_threshold:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_box_iou_matches_numpy():
    rng = np.random.default_rng(0)
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_elementwise_iou_is_diag():
    rng = np.random.default_rng(1)
    a = random_boxes(rng, 9)
    b = random_boxes(rng, 9)
    got = np.asarray(elementwise_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.diag(np_iou(a, b)), rtol=1e-5, atol=1e-6)


def test_zero_area_boxes_give_zero_iou():
    a = jnp.asarray([[10.0, 10.0, 10.0, 20.0]])  # zero width
    b = jnp.asarray([[5.0, 5.0, 25.0, 25.0]])
    assert float(box_iou(a, b)[0, 0]) == 0.0


def test_nms_matches_numpy_greedy():
    rng = np.random.default_rng(2)
    for trial in range(5):
        boxes = random_boxes(rng, 40, size=60.0)  # crowded -> many suppressions
        scores = rng.uniform(0.01, 1.0, 40).astype(np.float32)
        keep = np.asarray(
            nms_keep(
                jnp.asarray(boxes),
                jnp.asarray(scores),
                jnp.ones(40, bool),
                iou_threshold=0.5,
            )
        )
        expected = np_nms(boxes, scores, 0.5)
        assert sorted(np.nonzero(keep)[0].tolist()) == expected


def test_nms_respects_validity_mask():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], dtype=jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([False, True, True])
    keep = np.asarray(nms_keep(boxes, scores, valid, 0.5))
    # Box 0 invalid: never kept, never suppresses box 1.
    assert keep.tolist() == [False, True, True]


def test_batched_nms_separates_classes():
    # Two identical boxes, different classes: both survive class-wise NMS.
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([3, 5])
    valid = jnp.ones(2, bool)
    keep = np.asarray(batched_nms_keep(boxes, scores, labels, valid, 0.5))
    assert keep.tolist() == [True, True]
    # Same class: lower-scoring duplicate is suppressed.
    keep = np.asarray(
        batched_nms_keep(boxes, scores, jnp.asarray([3, 3]), valid, 0.5)
    )
    assert keep.tolist() == [True, False]


def test_resize_boxes():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    out = np.asarray(resize_boxes(boxes, (100, 200), (50, 100)))
    np.testing.assert_allclose(out, [[5.0, 10.0, 15.0, 20.0]])


def test_hflip_boxes_involution():
    rng = np.random.default_rng(3)
    boxes = jnp.asarray(random_boxes(rng, 6))
    flipped = hflip_boxes(boxes, 128.0)
    # x1 < x2 preserved and double flip is identity
    assert bool(jnp.all(flipped[:, 0] <= flipped[:, 2]))
    np.testing.assert_allclose(
        np.asarray(hflip_boxes(flipped, 128.0)), np.asarray(boxes), rtol=1e-6
    )
