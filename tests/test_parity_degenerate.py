"""Adversarial parity fixtures: degenerate images through twin and Flax.

Padded-vs-ragged implementations diverge exactly on the edge cases the
friendly fixtures never hit (round-2 verdict weak #6): zero humans, a single
box, >15 humans (cap + humans-first permutation), every detection below the
0.2 threshold, and GT boxes colliding with detections during the training
append (ref ``heads/...head.py:104-151``; empty-output behavior ``:845-857``).
Each case must produce the same pair set and per-pair scores from both
implementations — or the same documented empty output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.test_reference_parity import (
    CANVAS,
    HUMAN,
    build_jax_batch,
    build_twin,
    make_inputs,
    _flax_pairs,
)
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.oracle.convert import to_flax_variables


def degenerate_detections(rng):
    """(image_hw, boxes, labels, scores) per case; sizes fit the canvas."""

    def boxes_for(n, h, w, seed_rng):
        xy = seed_rng.uniform(0, [w * 0.5, h * 0.5], (n, 2))
        wh = seed_rng.uniform([w * 0.2, h * 0.2], [w * 0.45, h * 0.45], (n, 2))
        return np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1).astype(np.float32)

    cases = []
    # 1. zero humans: 4 objects only -> reference emits no pairs (:845-857)
    h, w = 100, 140
    b = boxes_for(4, h, w, rng)
    labels = rng.choice([i for i in range(80) if i != HUMAN], 4)
    cases.append(((h, w), b, labels.astype(np.int64),
                  rng.uniform(0.4, 0.9, 4).astype(np.float32)))
    # 2. a single (human) box: n <= 1 -> no pairs
    h, w = 110, 120
    cases.append(((h, w), boxes_for(1, h, w, rng), np.asarray([HUMAN], np.int64),
                  np.asarray([0.9], np.float32)))
    # 3. 20 humans + 18 objects: exercises the 15+15 cap and the
    #    humans-first permutation on a full slate
    h, w = 120, 150
    n_h, n_o = 20, 18
    b = boxes_for(n_h + n_o, h, w, rng)
    labels = np.concatenate([
        np.full(n_h, HUMAN), rng.choice([i for i in range(80) if i != HUMAN], n_o)
    ]).astype(np.int64)
    scores = rng.uniform(0.25, 0.99, n_h + n_o).astype(np.float32)
    cases.append(((h, w), b, labels, scores))
    # 4. every detection below the 0.2 threshold -> empty after filtering
    h, w = 100, 130
    b = boxes_for(5, h, w, rng)
    labels = np.concatenate([[HUMAN, HUMAN], rng.choice(80, 3)]).astype(np.int64)
    cases.append(((h, w), b, labels, rng.uniform(0.01, 0.19, 5).astype(np.float32)))
    # 5. mixed: some below threshold, one human surviving
    h, w = 115, 125
    b = boxes_for(6, h, w, rng)
    labels = np.concatenate([[HUMAN, HUMAN], rng.choice([i for i in range(80) if i != HUMAN], 4)]).astype(np.int64)
    scores = np.asarray([0.85, 0.1, 0.6, 0.15, 0.5, 0.05], np.float32)
    cases.append(((h, w), b, labels, scores))
    return cases


@pytest.fixture(scope="module")
def setup():
    _, _, object_to_action = make_inputs()
    twin = build_twin(object_to_action)
    variables = to_flax_variables(twin.state_dict())
    ovm = np.zeros((80, 117), np.float32)
    for o, verbs in enumerate(object_to_action):
        ovm[o, verbs] = 1.0
    return object_to_action, twin, variables, jnp.asarray(ovm), SpatiallyConditionedGraph()


def test_degenerate_eval_parity(setup):
    object_to_action, twin, variables, ovm, model = setup
    rng = np.random.default_rng(23)
    cases = degenerate_detections(rng)

    images = [rng.uniform(0, 1, (h, w, 3)).astype(np.float32) for (h, w), *_ in cases]
    detections = [(b, l, s) for _, b, l, s in cases]

    with torch.no_grad():
        t_results = twin(
            [torch.from_numpy(im).permute(2, 0, 1) for im in images],
            [dict(boxes=torch.from_numpy(b), labels=torch.from_numpy(l),
                  scores=torch.from_numpy(s)) for b, l, s in detections],
        )

    batch = build_jax_batch(images, detections)
    out = model.apply(variables, batch, ovm, training=False)

    # Cases 1, 2, 4 must be empty on BOTH sides (documented reference
    # behavior for no-valid-pairs images).
    for b_idx in (0, 1, 3):
        assert len(t_results[b_idx]["boxes_h"]) == 0, f"twin case {b_idx} not empty"
        assert len(_flax_pairs(out, b_idx)) == 0, f"flax case {b_idx} not empty"

    # Case 3 (capped slate) and case 5 (partial threshold) must agree
    # pair-for-pair and score-for-score.
    for b_idx in (2, 4):
        res = t_results[b_idx]
        pairs = _flax_pairs(out, b_idx)
        assert len(pairs) == len(res["boxes_h"]), f"pair count case {b_idx}"
        jb = np.asarray(out.boxes[b_idx])
        np.testing.assert_allclose(
            np.stack([jb[i] for i, _ in pairs]), res["boxes_h"].numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.stack([jb[j] for _, j in pairs]), res["boxes_o"].numpy(), atol=1e-3)
        jscores = np.asarray(out.scores[b_idx])
        jprior = np.asarray(out.prior[b_idx])
        expanded = [
            jscores[i, j, k]
            for (i, j) in pairs
            for k in np.nonzero(jprior[0, i, j])[0]
        ]
        assert len(expanded) == len(res["scores"]), f"expanded count case {b_idx}"
        np.testing.assert_allclose(
            np.asarray(expanded), res["scores"].numpy(), atol=1e-4,
            err_msg=f"scores case {b_idx}")
    # the cap actually bit in case 3
    assert int(out.n_h[2]) == 15 and int(out.n[2]) == 30


def test_gt_append_collision_parity(setup):
    """Training append with GT boxes IDENTICAL to detections: class-wise NMS
    dedups them (score-1.0 GT wins the sort), and the deterministic losses
    must match between twin and Flax."""
    object_to_action, twin, variables, ovm, model = setup
    rng = np.random.default_rng(31)

    h, w = 110, 140
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    xy = rng.uniform(0, [w * 0.4, h * 0.4], (4, 2))
    wh = rng.uniform([w * 0.25, h * 0.25], [w * 0.45, h * 0.45], (4, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1).astype(np.float32)
    labels = np.asarray([HUMAN, HUMAN, 3, 20], np.int64)
    scores = np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)

    # GT = exact copies of detection boxes (the collision)
    verbs = np.asarray([
        np.random.default_rng(1).choice(object_to_action[3]),
        np.random.default_rng(2).choice(object_to_action[20]),
    ], np.int64)
    targets_t = [dict(
        boxes_h=torch.from_numpy(boxes[[0, 1]]),
        boxes_o=torch.from_numpy(boxes[[2, 3]]),
        object=torch.from_numpy(labels[[2, 3]]),
        labels=torch.from_numpy(verbs),
    )]

    twin.train()
    try:
        t_results = twin(
            [torch.from_numpy(img).permute(2, 0, 1)],
            [dict(boxes=torch.from_numpy(boxes), labels=torch.from_numpy(labels),
                  scores=torch.from_numpy(scores))],
            targets=targets_t,
        )
    finally:
        twin.eval()
    t_losses = t_results[-1]

    batch = build_jax_batch([img], [(boxes, labels, scores)], targets=[
        dict(boxes_h=targets_t[0]["boxes_h"], boxes_o=targets_t[0]["boxes_o"],
             object=targets_t[0]["object"], labels=targets_t[0]["labels"])
    ])
    out = model.apply(variables, batch, ovm, training=True, rng=jax.random.PRNGKey(0))

    # the dedup happened: 4 unique boxes survive, not 8
    assert int(out.n[0]) == 4, int(out.n[0])
    np.testing.assert_allclose(
        float(out.losses["hoi_loss"]), float(t_losses["hoi_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out.losses["interactiveness_loss"]),
        float(t_losses["interactiveness_loss"]), rtol=1e-4)
