"""Visualise cached .mat results: per-class PR curves and ranked scores.

Counterpart of ``diagnosis/visualise_and_cache.py:30-65``: reads the
``detections_XX.mat`` caches produced by :mod:`skghoi_tpu.tools.cache_results`
and plots precision-recall + sorted-score curves for a chosen interaction
class of a chosen object.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy import io as sio


def main(argv=None):
    p = argparse.ArgumentParser(description="PR curves from cached .mat results")
    p.add_argument("--cache-dir", default="matlab_cache")
    p.add_argument("--object", default=0, type=int, help="COCO object class id")
    p.add_argument("--row", default=0, type=int, help="interaction row within the file")
    p.add_argument("--num-gt", default=None, type=int, help="GT count for recall")
    p.add_argument("--output", default="pr_curve.png")
    args = p.parse_args(argv)

    path = os.path.join(args.cache_dir, f"detections_{str(args.object).zfill(2)}.mat")
    mat = sio.loadmat(path)
    all_boxes = mat["all_boxes"]
    rows = all_boxes[args.row]
    scores = np.concatenate(
        [r[:, 8] for r in rows.ravel() if getattr(r, "size", 0) > 0] or [np.zeros(0)]
    )
    order = np.argsort(-scores)
    scores = scores[order]
    print(f"{path} row {args.row}: {len(scores)} detections")
    if len(scores) == 0:
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(scores)
    axes[0].set_title("ranked scores")
    if args.num_gt:
        # Without association labels only the score curve is exact; show the
        # optimistic PR upper bound (every detection a TP).
        tp = np.arange(1, len(scores) + 1)
        axes[1].plot(tp / args.num_gt, tp / tp)
        axes[1].set_title("PR upper bound")
    fig.savefig(args.output, dpi=120)
    print("Saved", args.output)


if __name__ == "__main__":
    main()
