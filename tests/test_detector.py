"""FPN detector: anchors, delta coding, matching, loss, decode, overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from skghoi_tpu import constants as C
from skghoi_tpu.detect.detector import (
    FPNDetector,
    decode_deltas,
    decode_detections,
    detector_loss,
    encode_deltas,
    generate_anchors,
    match_anchors,
)

CANVAS = (64, 96)


def test_anchor_count_and_validity():
    a = generate_anchors(CANVAS)
    expect = sum((CANVAS[0] // s) * (CANVAS[1] // s) * 9 for s in (8, 16, 32))
    assert a.shape == (expect, 4)
    assert (a[:, 2] > a[:, 0]).all() and (a[:, 3] > a[:, 1]).all()


def test_delta_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(generate_anchors(CANVAS)[:50])
    xy = rng.uniform(0, 60, (50, 2))
    wh = rng.uniform(4, 30, (50, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    rec = decode_deltas(anchors, encode_deltas(anchors, boxes))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), rtol=1e-4, atol=1e-3)


def test_match_anchors_states():
    anchors = jnp.asarray(
        [[0, 0, 16, 16], [0, 0, 15, 17], [40, 40, 56, 56], [7, 7, 24, 24.0]]
    )
    gt = jnp.asarray([[0, 0, 16, 16.0]])
    labels = jnp.asarray([5])
    valid = jnp.ones(1, bool)
    cls_t, box_t, state = match_anchors(anchors, gt, labels, valid)
    assert int(state[0]) == 1  # exact match
    assert int(state[2]) == 0  # disjoint -> background
    assert cls_t[0, 5] == 1.0 and cls_t[2].sum() == 0


def test_detector_overfits_one_box():
    """A few hundred steps on one image must localize the single GT box."""
    model = FPNDetector()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, *CANVAS, 3)).astype(np.float32))
    gt_boxes = jnp.asarray([[[20.0, 16.0, 60.0, 48.0]]])
    gt_labels = jnp.asarray([[7]])
    gt_valid = jnp.ones((1, 1), bool)
    anchors = jnp.asarray(generate_anchors(CANVAS))

    variables = dict(model.init(jax.random.PRNGKey(0), images))
    params = variables.pop("params")
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, deltas = model.apply({"params": p, **variables}, images)
            losses = detector_loss(logits, deltas, anchors, gt_boxes, gt_labels, gt_valid)
            return losses["cls_loss"] + losses["box_loss"], losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    first = None
    for i in range(150):
        params, opt_state, total = step(params, opt_state)
        if first is None:
            first = float(total)
    assert float(total) < first * 0.2, (first, float(total))

    logits, deltas = model.apply({"params": params, **variables}, images)
    det = decode_detections(logits, deltas, anchors, CANVAS, score_thresh=0.2, max_out=5)
    # Top detection overlaps the GT box with the right class.
    top_box = np.asarray(det.boxes[0, 0])
    gt = np.asarray(gt_boxes[0, 0])
    ix = max(0, min(top_box[2], gt[2]) - max(top_box[0], gt[0]))
    iy = max(0, min(top_box[3], gt[3]) - max(top_box[1], gt[1]))
    inter = ix * iy
    union = (
        (top_box[2] - top_box[0]) * (top_box[3] - top_box[1])
        + (gt[2] - gt[0]) * (gt[3] - gt[1])
        - inter
    )
    assert inter / union > 0.5, (top_box, gt)
    assert int(det.labels[0, 0]) == 7
