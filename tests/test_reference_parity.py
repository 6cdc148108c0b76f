"""End-to-end score parity: torch oracle twin vs the Flax/TPU model.

The twin (``skghoi_tpu/oracle/twin.py``) reimplements the reference's ragged
per-image stage-2 math in plain torch; the converter maps its weights onto the
Flax model.  Feeding both identical images + cached detections must produce
identical per-pair action scores (<= 1e-4) and matching training losses —
this is the evidence behind every "semantics match the reference" claim.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from skghoi_tpu.data import HOIBatch, HOITargets
from skghoi_tpu.data.transforms import bilinear_resize, resize_scale, resized_size, scale_boxes
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.oracle.convert import to_flax_variables
from skghoi_tpu.oracle.twin import SpatiallyConditionedGraphTwin

MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
HUMAN = 49
MIN_SIZE, MAX_SIZE = 96, 160
CANVAS = (128, 160)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    images = [
        rng.uniform(0, 1, (100, 150, 3)).astype(np.float32),
        rng.uniform(0, 1, (120, 110, 3)).astype(np.float32),
    ]

    def dets(n_h, n_o, h, w):
        n = n_h + n_o
        xy = rng.uniform(0, [w * 0.5, h * 0.5], (n, 2))
        wh = rng.uniform([w * 0.15, h * 0.15], [w * 0.45, h * 0.45], (n, 2))
        boxes = np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1)
        labels = np.concatenate([
            np.full(n_h, HUMAN), rng.choice([i for i in range(80) if i != HUMAN], n_o)
        ])
        scores = rng.uniform(0.35, 0.99, n)
        return boxes.astype(np.float32), labels.astype(np.int64), scores.astype(np.float32)

    detections = [dets(2, 3, 100, 150), dets(1, 3, 120, 110)]
    object_to_action = [sorted(rng.choice(117, size=rng.integers(1, 6), replace=False).tolist())
                        for _ in range(80)]
    return images, detections, object_to_action


def make_targets(rng, detections, object_to_action):
    """GT pairs overlapping the detections so fg association fires.  Verbs are
    drawn from object_to_action[object] — the dataset invariant that keeps the
    prior support and the GT labels consistent (otherwise n_p = 0 and the
    reference's loss normalization divides by zero)."""
    targets = []
    for boxes, labels, _ in detections:
        h_boxes = boxes[labels == HUMAN]
        o_boxes = boxes[labels != HUMAN]
        o_labels = labels[labels != HUMAN]
        g = min(len(h_boxes), len(o_boxes), 2)
        verbs = np.asarray(
            [rng.choice(object_to_action[o]) for o in o_labels[:g]], np.int64
        )
        targets.append(
            dict(
                boxes_h=torch.from_numpy(h_boxes[:g] + rng.uniform(-2, 2, (g, 4)).astype(np.float32)),
                boxes_o=torch.from_numpy(o_boxes[:g] + rng.uniform(-2, 2, (g, 4)).astype(np.float32)),
                object=torch.from_numpy(o_labels[:g]),
                labels=torch.from_numpy(verbs),
            )
        )
    return targets


def build_twin(object_to_action, seed=0):
    torch.manual_seed(seed)
    twin = SpatiallyConditionedGraphTwin(
        object_to_action=object_to_action, human_idx=HUMAN, fixed_canvas=CANVAS
    )
    twin.transform.min_size = MIN_SIZE
    twin.transform.max_size = MAX_SIZE
    twin.eval()
    return twin


def build_jax_batch(images, detections, targets=None):
    B = len(images)
    imgs = np.empty((B, *CANVAS, 3), np.float32)
    sizes = np.zeros((B, 2), np.float32)
    orig = np.zeros((B, 2), np.float32)
    M = max(len(d[0]) for d in detections)
    det_boxes = np.zeros((B, M, 4), np.float32)
    det_labels = np.zeros((B, M), np.int32)
    det_scores = np.zeros((B, M), np.float32)
    det_valid = np.zeros((B, M), bool)
    for b, (img, (boxes, labels, scores)) in enumerate(zip(images, detections)):
        h, w = img.shape[:2]
        scale = resize_scale(h, w, MIN_SIZE, MAX_SIZE)
        nh, nw = resized_size(h, w, scale)
        imgs[b] = MEAN
        imgs[b, :nh, :nw] = bilinear_resize(img, nh, nw)
        sizes[b] = (nh, nw)
        orig[b] = (h, w)
        n = len(boxes)
        det_boxes[b, :n] = scale_boxes(boxes, (h, w), (nh, nw))
        det_labels[b, :n] = labels
        det_scores[b, :n] = scores
        det_valid[b, :n] = True
    tgt = None
    if targets is not None:
        G = max(len(t["labels"]) for t in targets)
        bh = np.zeros((B, G, 4), np.float32)
        bo = np.zeros((B, G, 4), np.float32)
        obj = np.zeros((B, G), np.int32)
        lab = np.zeros((B, G), np.int32)
        val = np.zeros((B, G), bool)
        for b, t in enumerate(targets):
            h, w = images[b].shape[:2]
            nh, nw = sizes[b]
            g = len(t["labels"])
            bh[b, :g] = scale_boxes(t["boxes_h"].numpy(), (h, w), (nh, nw))
            bo[b, :g] = scale_boxes(t["boxes_o"].numpy(), (h, w), (nh, nw))
            obj[b, :g] = t["object"].numpy()
            lab[b, :g] = t["labels"].numpy()
            val[b, :g] = True
        tgt = HOITargets(jnp.asarray(bh), jnp.asarray(bo), jnp.asarray(obj),
                         jnp.asarray(lab), jnp.asarray(val))
    return HOIBatch(
        jnp.asarray(imgs), jnp.asarray(sizes), jnp.asarray(orig),
        jnp.asarray(det_boxes), jnp.asarray(det_labels), jnp.asarray(det_scores),
        jnp.asarray(det_valid), tgt,
    )


@pytest.fixture(scope="module")
def parity_setup():
    images, detections, object_to_action = make_inputs()
    twin = build_twin(object_to_action)
    variables = to_flax_variables(twin.state_dict())
    ovm = np.zeros((80, 117), np.float32)
    for o, verbs in enumerate(object_to_action):
        ovm[o, verbs] = 1.0
    model = SpatiallyConditionedGraph()
    return images, detections, object_to_action, twin, variables, jnp.asarray(ovm), model


def _flax_pairs(out, b):
    """Enumerate valid (i, j) pairs of image b in the twin's row-major order."""
    pv = np.asarray(out.pair_valid[b])
    return [(i, j) for i in range(pv.shape[0]) for j in range(pv.shape[1]) if pv[i, j]]


def test_eval_scores_match(parity_setup):
    images, detections, _, twin, variables, ovm, model = parity_setup

    with torch.no_grad():
        t_results = twin(
            [torch.from_numpy(im).permute(2, 0, 1) for im in images],
            [dict(boxes=torch.from_numpy(b), labels=torch.from_numpy(l),
                  scores=torch.from_numpy(s)) for b, l, s in detections],
        )

    batch = build_jax_batch(images, detections)
    out = model.apply(variables, batch, ovm, training=False)

    for b, res in enumerate(t_results):
        pairs = _flax_pairs(out, b)
        assert len(pairs) == len(res["boxes_h"]), f"pair count mismatch image {b}"
        jb = np.asarray(out.boxes[b])
        np.testing.assert_allclose(
            np.stack([jb[i] for i, _ in pairs]), res["boxes_h"].numpy(), atol=1e-3,
            err_msg=f"boxes_h image {b}")
        np.testing.assert_allclose(
            np.stack([jb[j] for _, j in pairs]), res["boxes_o"].numpy(), atol=1e-3,
            err_msg=f"boxes_o image {b}")

        # suppressor weights per pair
        jw = np.asarray(out.weights[b])
        np.testing.assert_allclose(
            np.asarray([jw[i, j] for i, j in pairs]), res["weights"].numpy(),
            atol=1e-4, err_msg=f"weights image {b}")

        # expanded action scores in the reference's (pair, verb) order
        jscores = np.asarray(out.scores[b])
        jprior = np.asarray(out.prior[b])  # [2, H, N, K]
        expanded = []
        for m, (i, j) in enumerate(pairs):
            for k in np.nonzero(jprior[0, i, j])[0]:
                expanded.append(jscores[i, j, k])
        assert len(expanded) == len(res["scores"]), f"expanded count image {b}"
        np.testing.assert_allclose(
            np.asarray(expanded), res["scores"].numpy(), atol=1e-4,
            err_msg=f"action scores image {b}")


def test_training_losses_match(parity_setup):
    images, detections, object_to_action, twin, variables, ovm, model = parity_setup
    rng = np.random.default_rng(7)
    targets = make_targets(rng, detections, object_to_action)

    twin.train()
    try:
        t_results = twin(
            [torch.from_numpy(im).permute(2, 0, 1) for im in images],
            [dict(boxes=torch.from_numpy(b), labels=torch.from_numpy(l),
                  scores=torch.from_numpy(s)) for b, l, s in detections],
            targets=targets,
        )
    finally:
        twin.eval()
    t_losses = t_results[-1]

    batch = build_jax_batch(images, detections, targets)
    out = model.apply(variables, batch, ovm, training=True, rng=jax.random.PRNGKey(0))

    # TransH loss depends on each side's own negative sampling RNG; the two
    # deterministic losses must agree.
    np.testing.assert_allclose(
        float(out.losses["hoi_loss"]), float(t_losses["hoi_loss"]), rtol=1e-4,
        err_msg="hoi_loss")
    np.testing.assert_allclose(
        float(out.losses["interactiveness_loss"]), float(t_losses["interactiveness_loss"]),
        rtol=1e-4, err_msg="interactiveness_loss")


def test_map_parity_on_synthetic_dataset(parity_setup):
    """End-to-end mAP parity: both pipelines' detections, scored by the same
    HICO-DET-style 11-point AP meter against shared GT, must agree within
    0.2 mAP (the round-1 acceptance bound; with score parity <=1e-4 the
    actual gap is ~0)."""
    from skghoi_tpu.ops.ap import BoxPairAssociation, DetectionAPMeter

    _, _, object_to_action, twin, variables, ovm, model = parity_setup

    # A larger synthetic set than the fixture's two images.
    rng = np.random.default_rng(11)
    images, detections = [], []
    for i in range(6):
        h, w = int(rng.integers(90, 130)), int(rng.integers(100, 150))
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        n_h, n_o = int(rng.integers(1, 3)), int(rng.integers(2, 4))
        n = n_h + n_o
        xy = rng.uniform(0, [w * 0.5, h * 0.5], (n, 2))
        wh = rng.uniform([w * 0.15, h * 0.15], [w * 0.45, h * 0.45], (n, 2))
        boxes = np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1)
        labels = np.concatenate([
            np.full(n_h, HUMAN), rng.choice([c for c in range(80) if c != HUMAN], n_o)
        ])
        scores = rng.uniform(0.35, 0.99, n)
        images.append(img)
        detections.append((boxes.astype(np.float32), labels.astype(np.int64),
                           scores.astype(np.float32)))

    # GT: perturbed copies of one (human, object) pair per image with a verb
    # admissible for the object -- so associations genuinely fire.
    gts = []
    for (boxes, labels, _), img in zip(detections, images):
        hb = boxes[labels == HUMAN][:1]
        ob = boxes[labels != HUMAN][:1]
        o_cls = labels[labels != HUMAN][:1]
        verb = np.asarray([rng.choice(object_to_action[o_cls[0]])])
        gts.append(dict(
            boxes_h=hb + rng.uniform(-2, 2, hb.shape).astype(np.float32),
            boxes_o=ob + rng.uniform(-2, 2, ob.shape).astype(np.float32),
            object=o_cls.astype(np.int64),
            verb=verb.astype(np.int64),
        ))

    # interaction id = (object, verb) enumeration over object_to_action
    o2i = -np.ones((80, 117), np.int64)
    next_id = 0
    for o in range(80):
        for v in object_to_action[o]:
            o2i[o, v] = next_id
            next_id += 1
    num_inter = next_id
    num_gt = np.zeros(num_inter)
    for g in gts:
        num_gt[o2i[g["object"][0], g["verb"][0]]] += 1

    def run_meter(entries_per_image):
        associate = BoxPairAssociation(min_iou=0.5)
        meter = DetectionAPMeter(num_inter, num_gt=num_gt.tolist(), algorithm="11P")
        for g, (bh, bo, obj, verb, sc) in zip(gts, entries_per_image):
            inter = o2i[obj, verb]
            keep = inter >= 0
            inter, sc, bh, bo = inter[keep], sc[keep], bh[keep], bo[keep]
            labels = np.zeros_like(sc)
            for hoi in np.unique(inter):
                gsel = o2i[g["object"][0], g["verb"][0]] == hoi
                dsel = np.nonzero(inter == hoi)[0]
                if gsel:
                    labels[dsel] = associate(
                        (g["boxes_h"].astype(np.float64), g["boxes_o"].astype(np.float64)),
                        (bh[dsel], bo[dsel]), sc[dsel])
            meter.append(sc, inter, labels)
        ap = meter.eval()
        return float(np.asarray(ap)[num_gt > 0].mean())

    # --- twin path ---
    with torch.no_grad():
        t_results = twin(
            [torch.from_numpy(im).permute(2, 0, 1) for im in images],
            [dict(boxes=torch.from_numpy(b), labels=torch.from_numpy(l),
                  scores=torch.from_numpy(s)) for b, l, s in detections],
            postprocess_boxes=True,
        )
    twin_entries = []
    for res in t_results:
        x = res["index"].numpy()
        twin_entries.append((
            res["boxes_h"].numpy()[x].astype(np.float64),
            res["boxes_o"].numpy()[x].astype(np.float64),
            res["object"].numpy()[x],
            res["prediction"].numpy(),
            res["scores"].numpy().astype(np.float64),
        ))

    # --- flax path ---
    from skghoi_tpu.eval.hoi_eval import jax_to_numpy, unpack_image_results

    batch = build_jax_batch(images, detections)
    out = jax_to_numpy(model.apply(variables, batch, ovm, training=False))
    flax_entries = []
    for i in range(len(images)):
        res = unpack_image_results(out, batch, i)
        flax_entries.append((
            res["boxes_h"].astype(np.float64), res["boxes_o"].astype(np.float64),
            res["object"], res["prediction"], res["scores"].astype(np.float64),
        ))

    map_twin = run_meter(twin_entries)
    map_flax = run_meter(flax_entries)
    assert abs(map_twin - map_flax) < 0.2, (map_twin, map_flax)
    # With <=1e-4 score parity the real gap is numerically tiny.
    np.testing.assert_allclose(map_flax, map_twin, atol=5e-3)
