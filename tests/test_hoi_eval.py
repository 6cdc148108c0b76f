"""HICO-DET evaluation loop on crafted outputs: known AP values."""

import numpy as np
import pytest

from skghoi_tpu import constants as C
from skghoi_tpu.data.structures import HOIBatch
from skghoi_tpu.data.synthetic import make_synthetic_hicodet
from skghoi_tpu.data.hicodet import HICODet
from skghoi_tpu.eval.hoi_eval import evaluate_hicodet, unpack_image_results
from skghoi_tpu.models.interaction_head import InteractionOutputs

import os


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hoieval"))
    make_synthetic_hicodet(root, "test2015", num_images=4, seed=7)
    return HICODet(
        root=os.path.join(root, "hico_20160224_det/images/test2015"),
        anno_file=os.path.join(root, "instances_test2015.json"),
    )


def _outputs_for(dataset, ds_index, hit: bool):
    """One-image InteractionOutputs predicting the first GT pair (or a miss)."""
    t = dataset.raw_target(ds_index)
    hoi = t["hoi"][0]
    _, obj, verb = next(c for c in dataset.class_corr if c[0] == hoi)
    gt_h = np.asarray(t["boxes_h"][0], np.float32) - [1, 1, 0, 0]
    gt_o = np.asarray(t["boxes_o"][0], np.float32) - [1, 1, 0, 0]

    B, H, N, K = 1, 2, 3, C.HICO_NUM_VERBS
    scores = np.zeros((B, H, N, K), np.float32)
    prior = np.zeros((B, 2, H, N, K), np.float32)
    pair_valid = np.zeros((B, H, N), bool)
    boxes = np.zeros((B, N, 4), np.float32)
    labels = np.zeros((B, N), np.int64)

    scores[0, 0, 1, verb] = 0.9
    prior[0, :, 0, 1, verb] = 0.5
    pair_valid[0, 0, 1] = True
    boxes[0, 0] = gt_h if hit else gt_h + 500.0
    boxes[0, 1] = gt_o if hit else gt_o + 500.0
    labels[0, 0] = C.HICO_HUMAN_IDX
    labels[0, 1] = obj

    out = InteractionOutputs(
        scores=scores, logits_p=scores, weights=np.zeros((B, H, N), np.float32),
        prior=prior, pair_valid=pair_valid, boxes=boxes, object_class=labels,
        n_h=np.asarray([1]), n=np.asarray([2]),
    )
    w, h = dataset.image_size(ds_index)
    batch = HOIBatch(
        images=np.zeros((B, 2, 2, 3)),
        image_sizes=np.asarray([[float(h), float(w)]]),
        original_sizes=np.asarray([[float(h), float(w)]]),
        det_boxes=None, det_labels=None, det_scores=None, det_valid=None,
    )
    return out, batch, hoi


def test_eval_scores_hits_and_misses(dataset):
    outs = {i: _outputs_for(dataset, i, hit=(i % 2 == 0)) for i in range(len(dataset))}
    loader = [(outs[i][1], [i]) for i in range(len(dataset))]

    calls = iter([outs[i][0] for i in range(len(dataset))])
    eval_step = lambda p, b: next(calls)

    result = evaluate_hicodet(eval_step, None, loader, dataset, log_fn=lambda s: None)
    ap = result["ap"]
    # Classes predicted with exact GT boxes (even images) should have AP ~1
    # (unless a miss image shares the class); misses contribute FPs only.
    hit_classes = {outs[i][2] for i in range(len(dataset)) if i % 2 == 0}
    miss_classes = {outs[i][2] for i in range(len(dataset)) if i % 2 == 1}
    for c in hit_classes - miss_classes:
        # the class may have several GT pairs; our single TP caps recall
        assert ap[c] > 0.0, c
    for c in miss_classes - hit_classes:
        assert ap[c] == 0.0, c


def test_unpack_rescales_boxes(dataset):
    out, batch, _ = _outputs_for(dataset, 0, hit=True)
    batch = batch._replace(
        image_sizes=np.asarray([[50.0, 60.0]]),
        original_sizes=np.asarray([[100.0, 120.0]]),
    )
    res = unpack_image_results(out, batch, 0)
    np.testing.assert_allclose(
        res["boxes_h"][0], np.asarray(out.boxes[0, 0]) * 2.0, rtol=1e-5
    )
