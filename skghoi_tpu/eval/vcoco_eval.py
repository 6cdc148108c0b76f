"""V-COCO role-AP evaluator (scenario 1 and 2), replacing ``vsrl_eval``.

The reference defers to the official V-COCO evaluator from its (absent)
``vcoco`` submodule: ``VCOCOeval(...)._do_eval(det_file, ovr_thresh=0.5)``
(``vcoco_evaluation.py:1-10``).  This module reimplements the published
metric (Gupta & Malik, "Visual Semantic Role Labeling"):

For each action with a role, detections are (person_box, role_box, score)
triples ranked by score over the whole test set.  A detection is a true
positive if its person box overlaps an unmatched GT person at IoU >=
``ovr_thresh`` for that action, and the role condition holds:

- **scenario 1**: if the GT role object is missing, the predicted role box
  must itself be "empty" (all zeros / the template's tiny default box);
  otherwise the role boxes must overlap at IoU >= ``ovr_thresh``.
- **scenario 2**: if the GT role object is missing, the role prediction is
  ignored (auto-match); otherwise as above.

AP is area-under-PR with the precision envelope; GT counts are the recall
denominators.  Agent AP (person box + action score only) is also reported.

GT comes from our V-COCO annotation JSON (``instances_vcoco_test.json``):
per image ``boxes_h``, ``boxes_o`` (zero rows = missing role) and
``actions``.
"""

from __future__ import annotations

import pickle
from collections import defaultdict
from typing import Dict, List

import numpy as np

from skghoi_tpu.data.vcoco import VCOCO
from skghoi_tpu.ops.ap import _np_box_iou, ap_from_pr


def _is_empty_box(box: np.ndarray) -> bool:
    b = np.asarray(box, np.float64).reshape(-1)[:4]
    return bool(np.all(b <= 0.11))  # zeros or the CacheTemplate tiny default


class VCOCOeval:
    def __init__(self, dataset: VCOCO):
        self.dataset = dataset
        # GT indexed by (image_id, action): list of (person_box, role_box)
        self.gt: Dict[tuple, List] = defaultdict(list)
        for i in range(len(dataset)):
            t = dataset.raw_target(i)
            img_id = dataset.image_id(i)
            bh = np.asarray(t["boxes_h"], np.float64).reshape(-1, 4)
            bo = np.asarray(t["boxes_o"], np.float64).reshape(-1, 4)
            for a, (hb, ob) in zip(t["actions"], zip(bh, bo)):
                self.gt[(img_id, int(a))].append((hb, ob))

    def _do_eval(self, det_file: str, ovr_thresh: float = 0.5) -> Dict[str, Dict[str, float]]:
        with open(det_file, "rb") as f:
            dets = pickle.load(f)

        actions = self.dataset.actions
        results = {}
        for a_idx, a_full in enumerate(actions):
            parts = a_full.split()
            verb = parts[0]
            role_key = "_".join(parts)
            agent_key = verb + "_agent"

            # Collect detections for this action.
            rows = []
            for d in dets:
                score_agent = d.get(agent_key, 0.0) if isinstance(d, dict) else d[agent_key]
                role = d[role_key] if role_key in d else None
                if role is None:
                    continue
                role = np.asarray(role, np.float64)
                rows.append(
                    (
                        d["image_id"],
                        np.asarray(d["person_box"], np.float64),
                        role[:4],
                        float(role[4]) if len(role) > 4 else float(score_agent),
                        float(score_agent),
                    )
                )
            n_gt = sum(len(v) for (img, a), v in self.gt.items() if a == a_idx)
            if n_gt == 0:
                continue

            res_a = {}
            for scenario in (1, 2):
                order = sorted(range(len(rows)), key=lambda i: -rows[i][3])
                matched = defaultdict(set)
                tp = np.zeros(len(rows))
                fp = np.zeros(len(rows))
                for rank, ri in enumerate(order):
                    img_id, pbox, rbox, score, _ = rows[ri]
                    gts = self.gt.get((img_id, a_idx), [])
                    best_j, best_ov = -1, -1.0
                    for j, (ghb, gob) in enumerate(gts):
                        if j in matched[img_id]:
                            continue
                        ov_p = _np_box_iou(pbox[None], ghb[None])[0, 0]
                        if ov_p < ovr_thresh:
                            continue
                        gt_role_missing = _is_empty_box(gob)
                        if gt_role_missing:
                            ok = _is_empty_box(rbox) if scenario == 1 else True
                        else:
                            ok = _np_box_iou(rbox[None], gob[None])[0, 0] >= ovr_thresh
                        if ok and ov_p > best_ov:
                            best_ov, best_j = ov_p, j
                    if best_j >= 0:
                        matched[img_id].add(best_j)
                        tp[rank] = 1
                    else:
                        fp[rank] = 1
                ctp, cfp = np.cumsum(tp), np.cumsum(fp)
                rec = ctp / n_gt
                prec = ctp / np.maximum(ctp + cfp, 1e-12)
                res_a[f"scenario_{scenario}"] = ap_from_pr(prec, rec, "INT")

            # Agent AP (person box + agent score only)
            order = sorted(range(len(rows)), key=lambda i: -rows[i][4])
            matched = defaultdict(set)
            tp = np.zeros(len(rows))
            fp = np.zeros(len(rows))
            for rank, ri in enumerate(order):
                img_id, pbox, _, _, score = rows[ri]
                gts = self.gt.get((img_id, a_idx), [])
                hit = -1
                for j, (ghb, _g) in enumerate(gts):
                    if j in matched[img_id]:
                        continue
                    if _np_box_iou(pbox[None], ghb[None])[0, 0] >= ovr_thresh:
                        hit = j
                        break
                if hit >= 0:
                    matched[img_id].add(hit)
                    tp[rank] = 1
                else:
                    fp[rank] = 1
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            res_a["agent"] = ap_from_pr(
                ctp / n_gt, ctp / np.maximum(ctp + cfp, 1e-12), "INT"
            )
            results[a_full] = res_a

        mean = {
            k: float(np.mean([r[k] for r in results.values() if k in r]))
            for k in ("scenario_1", "scenario_2", "agent")
        }
        print("V-COCO role AP:")
        for name, r in results.items():
            print(
                f"  {name}: agent {r.get('agent', 0):.4f} | "
                f"S1 {r.get('scenario_1', 0):.4f} | S2 {r.get('scenario_2', 0):.4f}"
            )
        print(
            f"mean role AP — scenario 1: {mean['scenario_1']:.4f}, "
            f"scenario 2: {mean['scenario_2']:.4f}, agent: {mean['agent']:.4f}"
        )
        return {"per_action": results, "mean": mean}
