"""Detection tools, .mat cacher, and the V-COCO evaluator on synthetic data."""

import json
import os
import pickle

import numpy as np
import pytest

from skghoi_tpu import constants as C
from skghoi_tpu.data.hicodet import HICODet
from skghoi_tpu.data.synthetic import make_synthetic_hicodet
from skghoi_tpu.detect import compute_detection_map, generate_gt_detections


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_hicodet(root, "test2015", num_images=6)
    dataset = HICODet(
        root=os.path.join(root, "hico_20160224_det/images/test2015"),
        anno_file=os.path.join(root, "instances_test2015.json"),
    )
    return root, dataset


def test_gt_detections_score_perfect_map(synth, tmp_path):
    root, dataset = synth
    cache = generate_gt_detections(dataset, str(tmp_path / "gt"))
    result = compute_detection_map(dataset, cache)
    present = result["num_gt"] > 0  # synthetic data covers few of the 80 classes
    assert result["ap"][present].mean() > 0.99, result["map"]


def test_cached_detections_from_pipeline_score_high(synth):
    root, dataset = synth
    # The synthetic caches are jittered GT boxes -> near-perfect detections.
    result = compute_detection_map(dataset, os.path.join(root, "detections_test2015"))
    present = result["num_gt"] > 0
    assert result["ap"][present].mean() > 0.8, result["map"]


def test_hicodet_dataset_luts(synth):
    _, dataset = synth
    corr = dataset.class_corr
    lut = dataset.object_n_verb_to_interaction
    for hoi, obj, verb in corr:
        assert lut[obj][verb] == hoi
    o2v = dataset.object_to_verb
    for hoi, obj, verb in corr:
        assert verb in o2v[obj]
    assert sum(dataset.anno_interaction) == sum(
        len(a["hoi"]) for a in dataset.annotations
    )
    mask = dataset.object_verb_mask()
    assert mask.shape == (80, 117)
    assert mask.sum() == len({(o, v) for _, o, v in corr})


def _vcoco_fixture(tmp_path):
    """Two images, one action with a role, one GT pair each."""
    anno = dict(
        filenames=["a.jpg", "b.jpg"],
        size=[[100, 100], [100, 100]],
        empty=[],
        annotation=[
            dict(boxes_h=[[10, 10, 30, 30]], boxes_o=[[50, 50, 70, 70]], actions=[0], objects=[5]),
            dict(boxes_h=[[20, 20, 40, 40]], boxes_o=[[0, 0, 0, 0]], actions=[0], objects=[0]),
        ],
        object_to_action=[[0]] * 80,
        actions=["hold obj"],
        image_ids=[101, 102],
    )
    path = tmp_path / "instances_vcoco_test.json"
    with open(path, "w") as f:
        json.dump(anno, f)
    from skghoi_tpu.data.vcoco import VCOCO

    return VCOCO(root=str(tmp_path), anno_file=str(path))


def test_vcoco_eval_scenarios(tmp_path):
    from skghoi_tpu.eval.cache import CacheTemplate
    from skghoi_tpu.eval.vcoco_eval import VCOCOeval

    ds = _vcoco_fixture(tmp_path)
    # Perfect detections: image 101 with the right role box; image 102 with an
    # EMPTY role box (GT role missing).
    rows = [
        CacheTemplate(image_id=101, person_box=[10, 10, 30, 30]),
        CacheTemplate(image_id=102, person_box=[20, 20, 40, 40]),
    ]
    rows[0]["hold_agent"] = 0.9
    rows[0]["hold_obj"] = [50, 50, 70, 70, 0.9]
    rows[1]["hold_agent"] = 0.8
    rows[1]["hold_obj"] = [0.0, 0.0, 0.0, 0.0, 0.8]
    det = tmp_path / "res.pkl"
    with open(det, "wb") as f:
        pickle.dump(rows, f, 2)
    res = VCOCOeval(ds)._do_eval(str(det))
    assert res["mean"]["scenario_1"] > 0.99
    assert res["mean"]["scenario_2"] > 0.99
    assert res["mean"]["agent"] > 0.99

    # Wrong role box in image 101: S1 and S2 both penalize; missing-role image
    # 102 with a NON-empty role box: S1 penalizes, S2 forgives.
    rows[0]["hold_obj"] = [0, 0, 10, 10, 0.9]
    rows[1]["hold_obj"] = [60, 60, 80, 80, 0.8]
    with open(det, "wb") as f:
        pickle.dump(rows, f, 2)
    res = VCOCOeval(ds)._do_eval(str(det))
    assert res["mean"]["scenario_1"] < 0.01
    assert 0.2 < res["mean"]["scenario_2"] < 0.75  # image 102 matches under S2


def test_mat_cache_layout(synth, tmp_path):
    """The .mat writer produces the official per-object-class layout."""
    from skghoi_tpu.eval.cache import cache_hicodet_mat
    from skghoi_tpu.models.interaction_head import InteractionOutputs
    from skghoi_tpu.data.structures import HOIBatch
    from scipy import io as sio

    _, dataset = synth
    B, H, N, K = 1, 2, 3, C.HICO_NUM_VERBS
    hoi0, obj0, verb0 = dataset.class_corr[0]

    scores = np.zeros((B, H, N, K), np.float32)
    scores[0, 0, 1, verb0] = 0.7
    prior = np.zeros((B, 2, H, N, K), np.float32)
    prior[0, :, 0, 1, verb0] = 0.5
    pair_valid = np.zeros((B, H, N), bool)
    pair_valid[0, 0, 1] = True
    boxes = np.asarray([[[1, 1, 11, 11], [21, 21, 41, 41], [0, 0, 0, 0.0]]], np.float32)
    object_class = np.asarray([[C.HICO_HUMAN_IDX, obj0, 0]])

    out = InteractionOutputs(
        scores=scores, logits_p=scores, weights=np.zeros((B, H, N), np.float32),
        prior=prior, pair_valid=pair_valid, boxes=boxes, object_class=object_class,
        n_h=np.asarray([1]), n=np.asarray([2]),
    )
    batch = HOIBatch(
        images=np.zeros((B, 4, 4, 3)), image_sizes=np.asarray([[100.0, 100.0]]),
        original_sizes=np.asarray([[100.0, 100.0]]),
        det_boxes=None, det_labels=None, det_scores=None, det_valid=None,
    )
    loader = [(batch, [0])]
    eval_step = lambda p, b: out
    coco2hico = {str(obj0): obj0}
    cache_hicodet_mat(eval_step, None, loader, dataset, coco2hico, str(tmp_path / "mat"))

    mat = sio.loadmat(str(tmp_path / "mat" / f"detections_{str(obj0).zfill(2)}.mat"))
    all_boxes = mat["all_boxes"]
    n_images_total = len(dataset.annotations)
    assert all_boxes.shape[1] == n_images_total
    # find our row: interaction hoi0 is the first interaction of obj0
    row = dataset.object_to_interaction[obj0].index(hoi0)
    entry = all_boxes[row, dataset._idx[0]]
    assert entry.shape == (1, 9)
    # pixel-index conversion applied to the x2/y2 corner only
    np.testing.assert_allclose(entry[0, :4], [1, 1, 10, 10])
    np.testing.assert_allclose(entry[0, 8], 0.7, rtol=1e-6)


def test_kge_results_table_renders(tmp_path, capsys):
    import json

    from skghoi_tpu.tools.kge_results_table import main

    path = tmp_path / "r.jsonl"
    rows = [
        dict(model="transe", data="/x/WN18RR", example="transe_wn18rr",
             hit10=0.533, mrr=0.232, steps_per_second=46.4),
        dict(model="transe", data="/x/WN18RR", example="transe_wn18rr",
             hit10=0.031, mrr=0.01, steps_per_second=48.0),  # superseded by...
    ]
    rows.append(dict(rows[0]))  # ...the rerun (last wins)
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    main([str(path)])
    out = capsys.readouterr().out
    assert "transe_wn18rr" in out and "0.533" in out and "+0.021" in out
    assert "0.031" not in out  # the superseded inverted run is not shown


def test_visualise_detections_overlay(synth, tmp_path):
    """Smoke the detection-cache overlay tool (reference:
    hicodet/detections/visualise.py) end-to-end on synthetic data."""
    from PIL import Image

    from skghoi_tpu.tools.visualise_detections import main

    root, _ = synth
    out = tmp_path / "overlay.jpg"
    main([
        "--data-root", root,
        "--detection-root", os.path.join(root, "detections_test2015"),
        "--partition", "test2015",
        "--image-idx", "1",
        "--out-file", str(out),
        "--box-score-thresh", "0.1",
        "--cpu",
    ])
    img = Image.open(out)
    assert img.size[0] > 0 and img.size[1] > 0
