"""Overlay a raw detection-cache JSON on its image.

Counterpart of the reference's ``hicodet/detections/visualise.py``: load one
image + its cached ``{boxes, labels, scores}`` JSON, drop low-scoring boxes,
NMS, and draw ``score label`` text per kept box.  Differences: class names
come from ``data/hico_meta.py`` (same HICO order as the reference's inline
tuple) and NMS is the in-repo ``ops.boxes.nms_keep`` (torchvision-semantics,
tested) instead of torchvision.

    python -m skghoi_tpu.tools.visualise_detections \
        --data-root hicodet --detection-root detections/train2015 \
        --image-idx 0 --out-file result.jpg
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Visualize object detections")
    p.add_argument("--detection-root", type=str, required=True)
    p.add_argument("--image-idx", type=int, default=0)
    p.add_argument("--out-file", type=str, default="result.jpg")
    p.add_argument("--data-root", type=str, default="./")
    p.add_argument("--partition", type=str, default="train2015")
    p.add_argument("--box-score-thresh", type=float, default=0.3)
    p.add_argument("--nms-thresh", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image, ImageDraw

    from skghoi_tpu.data.hico_meta import HICO_OBJECTS
    from skghoi_tpu.data.hicodet import HICODet
    from skghoi_tpu.ops.boxes import nms_keep

    dataset = HICODet(
        root=os.path.join(
            args.data_root, f"hico_20160224_det/images/{args.partition}"
        ),
        anno_file=os.path.join(args.data_root, f"instances_{args.partition}.json"),
    )
    name = dataset.filename(args.image_idx)
    print("Image name: ", name)
    image = Image.open(
        os.path.join(args.data_root,
                     f"hico_20160224_det/images/{args.partition}", name)
    ).convert("RGB")
    with open(os.path.join(args.detection_root,
                           name.replace(".jpg", ".json"))) as f:
        det = json.load(f)

    boxes = np.asarray(det["boxes"], np.float32).reshape(-1, 4)
    scores = np.asarray(det["scores"], np.float32).reshape(-1)
    labels = np.asarray(det["labels"], np.int64).reshape(-1)
    keep = scores >= args.box_score_thresh
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    if len(boxes):
        mask = np.asarray(
            nms_keep(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.ones(len(boxes), bool), args.nms_thresh)
        )
        boxes, scores, labels = boxes[mask], scores[mask], labels[mask]

    draw = ImageDraw.Draw(image)
    for b, s, l in zip(boxes, scores, labels):
        draw.rectangle(b.tolist())
        draw.text(b[:2].tolist(), f"{str(float(s))[:4]} {HICO_OBJECTS[int(l)]}")
    image.save(args.out_file)
    print(f"Saved {args.out_file} ({len(boxes)} boxes)")


if __name__ == "__main__":
    main()
