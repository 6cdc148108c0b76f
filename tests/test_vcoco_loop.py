"""Synthetic V-COCO loop: generator -> dataset -> perfect results -> role AP 1.0."""

import os
import pickle

import numpy as np

from skghoi_tpu.data.synthetic import make_synthetic_vcoco
from skghoi_tpu.data.vcoco import VCOCO
from skghoi_tpu.eval.cache import CacheTemplate
from skghoi_tpu.eval.vcoco_eval import VCOCOeval


def test_synthetic_vcoco_roundtrip(tmp_path):
    root = str(tmp_path)
    make_synthetic_vcoco(root, "test", num_images=5)
    ds = VCOCO(
        root=os.path.join(root, "mscoco2014/val2014"),
        anno_file=os.path.join(root, "instances_vcoco_test.json"),
    )
    assert len(ds) == 5
    assert len(ds.actions) == 24
    assert ds.object_verb_mask().shape == (80, 24)

    rows = []
    for i in range(len(ds)):
        t = ds.raw_target(i)
        for bh, bo, a in zip(t["boxes_h"], t["boxes_o"], t["actions"]):
            name = ds.actions[a].split()
            r = CacheTemplate(image_id=ds.image_id(i), person_box=list(bh))
            r[name[0] + "_agent"] = 0.9
            r["_".join(name)] = list(bo) + [0.9]
            rows.append(r)
    det = os.path.join(root, "res.pkl")
    with open(det, "wb") as f:
        pickle.dump(rows, f, 2)

    res = VCOCOeval(ds)._do_eval(det)
    assert res["mean"]["scenario_1"] > 0.99
    assert res["mean"]["scenario_2"] > 0.99
    assert res["mean"]["agent"] > 0.99
