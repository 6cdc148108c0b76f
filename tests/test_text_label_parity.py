"""Verbatim parity of generated HICO prompts/splits vs the reference tables.

Reads ``/root/reference/hicodet/hico_text_label.py`` with ``ast.literal_eval``
(pure data, never executed) and asserts the programmatic generator reproduces
every string exactly: 600 pair prompts, 81 object prompts, 117 gerunds, the
verb<->object validity maps, and the shipped unseen-index splits.
"""

import ast
import os
import re

import pytest

from skghoi_tpu.data import hico_meta
from skghoi_tpu.data.text_label import (
    gerund,
    hico_obj_text_labels,
    pair_prompt,
    unseen_index_splits,
    verb_to_objects,
)

REF = "/root/reference/hicodet/hico_text_label.py"


@pytest.fixture(scope="module")
def ref_tables():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not mounted")
    data = {}
    for node in ast.parse(open(REF).read()).body:
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            try:
                data[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    return data


def test_pair_prompts_verbatim(ref_tables):
    ref = ref_tables["hico_text_label"]
    assert len(ref) == 600
    assert list(ref.keys()) == hico_meta.HICO_INTERACTIONS
    for (vi, oi), want in ref.items():
        got = pair_prompt(hico_meta.HICO_VERBS[vi], hico_meta.HICO_OBJECTS[oi])
        assert got == want, (vi, oi, got, want)


def test_object_prompts_verbatim(ref_tables):
    ref = ref_tables["hico_obj_text_label"]
    got = hico_obj_text_labels(hico_meta.HICO_OBJECTS_COCO_ORDER)
    assert got == ref


def test_gerunds_match_ongoing_classes(ref_tables):
    actions = ref_tables["hico_action_classes"]
    ongoing = ref_tables["hico_action_ongoing_classes"]
    for a, want in zip(actions, ongoing):
        tok = a.replace(" ", "_")
        if tok == "no_interaction":
            continue  # the reference keeps 'no interaction' in this list
        assert gerund(tok) == want, (a, gerund(tok), want)


def test_validity_maps_match(ref_tables):
    class_corr = [(i, oi, vi) for i, (vi, oi) in enumerate(hico_meta.HICO_INTERACTIONS)]
    v2o = verb_to_objects(class_corr, 117)
    ref_v2o = ref_tables["hico_valid_hoi_pair"]
    for v, objs in ref_v2o.items():
        # reference lists append no_interaction's 57 verb-marker at the end of
        # each entry; compare as sets over the true object ids
        assert set(v2o[v]) == set(o for o in objs), v

    # object -> verbs table
    o2v = [[] for _ in range(80)]
    for _, oi, vi in class_corr:
        o2v[oi].append(vi)
    ref_o2v = ref_tables["hico_action_valid_object_list"]
    for o, verbs in ref_o2v.items():
        assert set(o2v[o]) == set(verbs), o


def test_unseen_splits_shipped_verbatim(ref_tables):
    assert hico_meta.HICO_UNSEEN_INDEX == ref_tables["hico_unseen_index"]
    # and the computed-rare path still yields well-formed splits
    counts = list(range(600))
    splits = unseen_index_splits(counts, num_unseen=120)
    assert len(splits["rare_first"]) == 120 and splits["rare_first"][0] == 0
    assert splits["non_rare_first"][0] == 599
