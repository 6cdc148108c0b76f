"""Fast-tier twin-parity smoke: the eval score contract in < 30 s.

The full parity suite (``test_reference_parity.py``, module-level ``slow``
marker) costs minutes of compile; this module keeps one reduced-geometry
eval check (one image, 64x96 canvas, 4-human/6-object caps, 1 message-passing
iteration) in the fast ``pytest -m "not slow"`` subset so the strongest
evidence — per-pair action scores vs the torch twin — guards every CI-shaped
run, not only the slow tier.  Same contract as the reference composition
(``models/...models.py:118-200``), smaller shapes.
"""

import numpy as np
import jax.numpy as jnp
import torch

from skghoi_tpu.data import HOIBatch
from skghoi_tpu.data.transforms import (
    bilinear_resize,
    resize_scale,
    resized_size,
    scale_boxes,
)
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.oracle.convert import to_flax_variables
from skghoi_tpu.oracle.twin import SpatiallyConditionedGraphTwin

MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
HUMAN = 49
MIN_SIZE, MAX_SIZE = 48, 96
CANVAS = (64, 96)
MAX_H, MAX_O = 4, 6


def test_eval_scores_match_reduced_geometry():
    rng = np.random.default_rng(11)
    image = rng.uniform(0, 1, (50, 75, 3)).astype(np.float32)
    h, w = image.shape[:2]

    n_h, n_o = 2, 3
    n = n_h + n_o
    xy = rng.uniform(0, [w * 0.5, h * 0.5], (n, 2))
    wh = rng.uniform([w * 0.2, h * 0.2], [w * 0.45, h * 0.45], (n, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, [w - 1, h - 1])], -1).astype(np.float32)
    labels = np.concatenate(
        [np.full(n_h, HUMAN), rng.choice([i for i in range(80) if i != HUMAN], n_o)]
    ).astype(np.int64)
    scores = rng.uniform(0.35, 0.99, n).astype(np.float32)
    object_to_action = [
        sorted(rng.choice(117, size=rng.integers(1, 6), replace=False).tolist())
        for _ in range(80)
    ]

    torch.manual_seed(3)
    twin = SpatiallyConditionedGraphTwin(
        object_to_action=object_to_action, human_idx=HUMAN, fixed_canvas=CANVAS,
        max_human=MAX_H, max_object=MAX_O, num_iterations=1,
    )
    twin.transform.min_size = MIN_SIZE
    twin.transform.max_size = MAX_SIZE
    twin.eval()
    with torch.no_grad():
        res = twin(
            [torch.from_numpy(image).permute(2, 0, 1)],
            [dict(boxes=torch.from_numpy(boxes), labels=torch.from_numpy(labels),
                  scores=torch.from_numpy(scores))],
        )[0]

    variables = to_flax_variables(twin.state_dict())
    ovm = np.zeros((80, 117), np.float32)
    for o, verbs in enumerate(object_to_action):
        ovm[o, verbs] = 1.0
    model = SpatiallyConditionedGraph(
        max_human=MAX_H, max_object=MAX_O, num_iterations=1
    )

    scale = resize_scale(h, w, MIN_SIZE, MAX_SIZE)
    nh, nw = resized_size(h, w, scale)
    img = np.tile(MEAN, (*CANVAS, 1)).astype(np.float32)
    img[:nh, :nw] = bilinear_resize(image, nh, nw)
    batch = HOIBatch(
        jnp.asarray(img)[None],
        jnp.asarray([(nh, nw)], jnp.float32),
        jnp.asarray([(h, w)], jnp.float32),
        jnp.asarray(scale_boxes(boxes, (h, w), (nh, nw)))[None],
        jnp.asarray(labels, jnp.int32)[None],
        jnp.asarray(scores)[None],
        jnp.ones((1, n), bool),
        None,
    )
    out = model.apply(variables, batch, jnp.asarray(ovm), training=False)

    pv = np.asarray(out.pair_valid[0])
    pairs = [(i, j) for i in range(pv.shape[0]) for j in range(pv.shape[1]) if pv[i, j]]
    assert len(pairs) == len(res["boxes_h"]), "pair count mismatch"

    jb = np.asarray(out.boxes[0])
    np.testing.assert_allclose(
        np.stack([jb[i] for i, _ in pairs]), res["boxes_h"].numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.stack([jb[j] for _, j in pairs]), res["boxes_o"].numpy(), atol=1e-3)

    jw = np.asarray(out.weights[0])
    np.testing.assert_allclose(
        np.asarray([jw[i, j] for i, j in pairs]), res["weights"].numpy(), atol=1e-4)

    jscores = np.asarray(out.scores[0])
    jprior = np.asarray(out.prior[0])
    expanded = []
    for i, j in pairs:
        for k in np.nonzero(jprior[0, i, j])[0]:
            expanded.append(jscores[i, j, k])
    assert len(expanded) == len(res["scores"]), "expanded score count mismatch"
    np.testing.assert_allclose(
        np.asarray(expanded), res["scores"].numpy(), atol=1e-4)
