"""Measure the reference pipeline's torch-CPU inference throughput.

BASELINE.json's target is "images/sec >= 5x the PyTorch-CPU baseline"; this
tool produces that denominator honestly by timing the oracle twin — the
reference's exact stage-2 math in plain torch — on the same 832x1344 canvas
and detection load the TPU benchmark uses.  Writes ``BASELINE_TORCH.json``
(read by ``bench.py`` to compute ``vs_baseline``).

    python -m skghoi_tpu.tools.bench_torch_baseline --images 4 --warmup 1
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1292)
    p.add_argument("--dets", type=int, default=20)
    p.add_argument("--out", default="BASELINE_TORCH.json")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from skghoi_tpu.oracle.twin import SpatiallyConditionedGraphTwin

    rng = np.random.default_rng(args.seed)
    object_to_action = [
        sorted(rng.choice(117, size=rng.integers(1, 6), replace=False).tolist())
        for _ in range(80)
    ]
    torch.manual_seed(args.seed)
    twin = SpatiallyConditionedGraphTwin(
        object_to_action=object_to_action, human_idx=49, fixed_canvas=(832, 1344)
    )
    twin.eval()

    def make_image():
        img = rng.uniform(0, 1, (3, args.height, args.width)).astype(np.float32)
        n = args.dets
        xy = rng.uniform(0, [args.width * 0.6, args.height * 0.6], (n, 2))
        wh = rng.uniform([60, 60], [args.width * 0.4, args.height * 0.4], (n, 2))
        boxes = np.concatenate(
            [xy, np.minimum(xy + wh, [args.width - 1, args.height - 1])], -1
        ).astype(np.float32)
        labels = np.concatenate([np.full(6, 49), rng.integers(0, 80, n - 6)])
        scores = rng.uniform(0.3, 0.99, n).astype(np.float32)
        return (
            torch.from_numpy(img),
            dict(
                boxes=torch.from_numpy(boxes),
                labels=torch.from_numpy(labels.astype(np.int64)),
                scores=torch.from_numpy(scores),
            ),
        )

    samples = [make_image() for _ in range(args.images + args.warmup)]
    with torch.no_grad():
        for img, det in samples[: args.warmup]:
            twin([img], [det])
        t0 = time.perf_counter()
        for img, det in samples[args.warmup:]:
            twin([img], [det])
        dt = time.perf_counter() - t0

    result = {
        "metric": "torch_cpu_inference_images_per_sec",
        "value": args.images / dt,
        "unit": "img/s",
        "images": args.images,
        "seconds": dt,
        "canvas": [832, 1344],
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
