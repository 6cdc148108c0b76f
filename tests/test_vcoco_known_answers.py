"""Known-answer tests for the official vsrl_eval matching semantics.

Hand-computed APs that distinguish the official evaluator's rules from the
plausible-but-wrong variants:

- a detection whose argmax-of-min(ov, ov_role) GT is already covered is a FP
  even when another uncovered GT would also pass (official ``jmax`` rule);
- scenario 1 demands an all-zero/NaN role box for missing GT roles — the
  CacheTemplate tiny ``[0, 0, .1, .1]`` box fails, scenario 2 auto-passes.
"""

import pickle

import numpy as np
import pytest

from skghoi_tpu.eval.vcoco_eval import VCOCOeval


class FakeVCOCO:
    """Minimal duck-typed stand-in for data.vcoco.VCOCO."""

    def __init__(self, targets, actions):
        self._targets = targets
        self._actions = actions

    def __len__(self):
        return len(self._targets)

    def raw_target(self, i):
        return self._targets[i]

    def image_id(self, i):
        return self._targets[i]["image_id"]

    @property
    def actions(self):
        return list(self._actions)


def run_eval(targets, dets, tmp_path, actions=("hold obj",)):
    ds = FakeVCOCO(targets, actions)
    det_file = tmp_path / "dets.pkl"
    with open(det_file, "wb") as f:
        pickle.dump(dets, f)
    return VCOCOeval(ds)._do_eval(str(det_file))


def test_perfect_single_detection(tmp_path):
    targets = [dict(image_id=1, boxes_h=[[0, 0, 10, 10]], boxes_o=[[50, 50, 60, 60]],
                    actions=[0])]
    dets = [dict(image_id=1, person_box=[0, 0, 10, 10],
                 hold_obj=[50, 50, 60, 60, 0.9], hold_agent=0.9)]
    res = run_eval(targets, dets, tmp_path)
    r = res["per_action"]["hold obj"]
    assert r["scenario_1"] == r["scenario_2"] == r["agent"] == 1.0


def test_covered_gt_argmax_rule(tmp_path):
    """D2's best joint overlap is the already-covered G1 -> FP, even though
    uncovered G2 also passes the threshold.  AP = 0.5*1 + 0.5*(2/3) = 5/6."""
    role = [50, 50, 60, 60]
    targets = [dict(image_id=1,
                    boxes_h=[[0, 0, 10, 10], [4, 0, 14, 10]],
                    boxes_o=[role, role],
                    actions=[0, 0])]
    mk = lambda pbox, s: dict(image_id=1, person_box=pbox,
                              hold_obj=role + [s], hold_agent=s)
    dets = [
        mk([0, 0, 10, 10], 0.9),   # TP on G1
        mk([1, 0, 11, 10], 0.8),   # argmax-min -> G1 (covered) -> FP
        mk([4, 0, 14, 10], 0.7),   # TP on G2
    ]
    res = run_eval(targets, dets, tmp_path)
    for key in ("scenario_1", "scenario_2", "agent"):
        np.testing.assert_allclose(res["per_action"]["hold obj"][key], 5.0 / 6.0,
                                   rtol=1e-9, err_msg=key)


def test_empty_role_scenarios(tmp_path):
    """Missing GT role: scenario 1 needs an all-zero role box (the tiny
    CacheTemplate default fails); scenario 2 always grants the role."""
    targets = [dict(image_id=1, boxes_h=[[0, 0, 10, 10]], boxes_o=[[0, 0, 0, 0]],
                    actions=[0])]
    tiny = dict(image_id=1, person_box=[0, 0, 10, 10],
                hold_obj=[0.0, 0.0, 0.1, 0.1, 0.9], hold_agent=0.9)
    res = run_eval(targets, [tiny], tmp_path)
    assert res["per_action"]["hold obj"]["scenario_1"] == 0.0
    assert res["per_action"]["hold obj"]["scenario_2"] == 1.0

    zero = dict(tiny, hold_obj=[0.0, 0.0, 0.0, 0.0, 0.9])
    res = run_eval(targets, [zero], tmp_path)
    assert res["per_action"]["hold obj"]["scenario_1"] == 1.0

    nanbox = dict(tiny, hold_obj=[np.nan, np.nan, np.nan, np.nan, 0.9])
    res = run_eval(targets, [nanbox], tmp_path)
    assert res["per_action"]["hold obj"]["scenario_1"] == 1.0


def test_missing_role_counts_in_recall_denominator(tmp_path):
    """Two GT instances (one missing role); one perfect detection of the
    role-full instance -> recall caps at 1/2, AP = 1/2 in both scenarios."""
    targets = [dict(image_id=1,
                    boxes_h=[[0, 0, 10, 10], [30, 0, 40, 10]],
                    boxes_o=[[50, 50, 60, 60], [0, 0, 0, 0]],
                    actions=[0, 0])]
    dets = [dict(image_id=1, person_box=[0, 0, 10, 10],
                 hold_obj=[50, 50, 60, 60, 0.9], hold_agent=0.9)]
    res = run_eval(targets, dets, tmp_path)
    np.testing.assert_allclose(res["per_action"]["hold obj"]["scenario_1"], 0.5)
    np.testing.assert_allclose(res["per_action"]["hold obj"]["scenario_2"], 0.5)
