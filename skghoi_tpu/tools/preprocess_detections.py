"""Generate detections with an imported torchvision Faster R-CNN checkpoint.

Mirror of the reference's ``hicodet/detections/preprocessing.py`` CLI: runs
a ``fasterrcnn_resnet50_fpn``-format checkpoint over a dataset partition and
caches one JSON per image (boxes / labels / scores, original-image
coordinates, COCO ids remapped to HICO 80 via ``coco80tohico80.json`` when
present).  The detector itself is the Flax re-expression in
:mod:`skghoi_tpu.detect.frcnn` — no torchvision needed; the checkpoint may
be a raw ``state_dict`` or a dict holding ``model_state_dict``.

    python -m skghoi_tpu.tools.preprocess_detections \
        --data-root data/hicodet --partition train2015 \
        --ckpt-path checkpoints/fasterrcnn_resnet50_fpn_coco.pt
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from skghoi_tpu import constants as C
from skghoi_tpu.data.hicodet import HICODet
from skghoi_tpu.data.transforms import (
    bilinear_resize,
    canvas_for,
    resize_scale,
    resized_size,
)
from skghoi_tpu.detect.frcnn import FasterRCNN, load_torch_fasterrcnn
from skghoi_tpu.detect.generate import generate_model_detections


def build_detr_detector_fn(variables, score_thresh: float, num_classes: int = 91,
                           min_size: int = C.IMAGE_MIN_SIZE,
                           max_size: int = C.IMAGE_MAX_SIZE, canvas=None):
    """DETR flavour of :func:`build_detector_fn` (``main_detr.py`` path):
    per-query max-class scores, no NMS (DETR's set prediction)."""
    import jax
    import jax.numpy as jnp

    from skghoi_tpu.detect.detr import DETR

    model = DETR(num_classes=num_classes)
    run = jax.jit(lambda v, img, sizes: model.apply(v, img, sizes))
    mean = np.asarray(C.IMAGE_MEAN, np.float32)
    std = np.asarray(C.IMAGE_STD, np.float32)

    def detector(arr: np.ndarray):
        h, w = arr.shape[:2]
        scale = resize_scale(h, w, min_size, max_size)
        nh, nw = resized_size(h, w, scale)
        cv = canvas if canvas is not None else canvas_for(nh, nw)
        nh, nw = min(nh, cv[0]), min(nw, cv[1])
        resized = bilinear_resize(arr.astype(np.float32), nh, nw)
        padded = np.zeros((cv[0], cv[1], 3), np.float32)
        padded[:nh, :nw] = (resized - mean) / std
        # DETR normalizes boxes to the PADDED canvas it saw; scale by the
        # canvas extent, then back to original image coordinates.
        det = run(variables, jnp.asarray(padded)[None],
                  jnp.asarray([[float(cv[0]), float(cv[1])]]))
        keep = np.asarray(det.scores[0]) >= score_thresh
        boxes = np.asarray(det.boxes[0])[keep] / scale
        return boxes, np.asarray(det.labels[0])[keep], np.asarray(det.scores[0])[keep]

    return detector


def build_adamixer_detector_fn(variables, score_thresh: float,
                               num_classes: int = 80,
                               min_size: int = C.IMAGE_MIN_SIZE,
                               max_size: int = C.IMAGE_MAX_SIZE, canvas=None,
                               **model_overrides):
    """AdaMixer flavour (the reference's actual stage-1 generation pipeline,
    ``hicodet/detections/adamixer_preprocessing.py:43-58``): run the
    query-based decoder, keep the last stage's per-query (argmax class,
    sigmoid score) — query detectors emit a fixed set, no NMS.  Labels are
    HICO ids directly when the detector was trained on HICO classes (the
    mmdet80->hico80 remap is only needed for COCO-trained checkpoints and is
    applied by the caller via ``label_map``)."""
    import jax
    import jax.numpy as jnp

    from skghoi_tpu.detect.adamixer import AdaMixerDetector

    model = AdaMixerDetector(num_classes=num_classes, **model_overrides)
    run = jax.jit(lambda v, img: model.apply(v, img))

    def detector(arr: np.ndarray):
        h, w = arr.shape[:2]
        scale = resize_scale(h, w, min_size, max_size)
        nh, nw = resized_size(h, w, scale)
        cv = canvas if canvas is not None else canvas_for(nh, nw)
        nh, nw = min(nh, cv[0]), min(nw, cv[1])
        resized = bilinear_resize(arr.astype(np.float32), nh, nw)
        padded = np.zeros((cv[0], cv[1], 3), np.float32)
        padded[:nh, :nw] = resized  # model normalizes internally
        out = run(variables, np.asarray(padded)[None])
        logits = np.asarray(out.cls_logits[-1, 0])  # last stage
        boxes = np.asarray(out.boxes[-1, 0]) / scale
        scores = 1.0 / (1.0 + np.exp(-logits.max(axis=1)))
        labels = logits.argmax(axis=1)
        keep = scores >= score_thresh
        return boxes[keep], labels[keep], scores[keep]

    return detector


def build_detector_fn(variables, score_thresh: float, nms_thresh: float,
                      num_detections: int, min_size: int = C.IMAGE_MIN_SIZE,
                      max_size: int = C.IMAGE_MAX_SIZE, canvas=None,
                      **model_overrides):
    """Returns ``detector(arr [H, W, 3] in [0, 1]) -> (boxes, labels, scores)``
    in original-image coordinates with COCO class ids.  ``min_size`` /
    ``max_size`` / ``canvas`` override the torchvision transform envelope
    (tests use small values; production keeps the 800/1333 defaults)."""
    import jax
    import jax.numpy as jnp

    model = FasterRCNN(
        box_score_thresh=score_thresh,
        box_nms_thresh=nms_thresh,
        detections_per_img=num_detections,
        **model_overrides,
    )

    # jax.jit retraces per input shape: one compile per canvas orientation.
    run = jax.jit(lambda v, img, sizes: model.apply(v, img, sizes))

    mean = np.asarray(C.IMAGE_MEAN, np.float32)
    std = np.asarray(C.IMAGE_STD, np.float32)

    def detector(arr: np.ndarray):
        h, w = arr.shape[:2]
        scale = resize_scale(h, w, min_size, max_size)
        nh, nw = resized_size(h, w, scale)
        cv = canvas if canvas is not None else canvas_for(nh, nw)
        nh, nw = min(nh, cv[0]), min(nw, cv[1])
        resized = bilinear_resize(arr.astype(np.float32), nh, nw)
        padded = np.zeros((cv[0], cv[1], 3), np.float32)
        padded[:nh, :nw] = (resized - mean) / std
        det = run(
            variables,
            jnp.asarray(padded)[None],
            jnp.asarray([[float(nh), float(nw)]]),
        )
        valid = np.asarray(det.valid[0])
        boxes = np.asarray(det.boxes[0])[valid] / scale
        labels = np.asarray(det.labels[0])[valid]
        scores = np.asarray(det.scores[0])[valid]
        return boxes, labels, scores

    return detector


def load_checkpoint_state_dict(path: str):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return blob


def main(argv=None):
    parser = argparse.ArgumentParser(description="Faster R-CNN detection generation")
    parser.add_argument("--partition", type=str, default="train2015")
    parser.add_argument("--data-root", type=str, default="data/hicodet")
    parser.add_argument("--cache-dir", type=str, default="detections")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--score-thresh", type=float, default=0.05)
    parser.add_argument("--nms-thresh", type=float, default=0.5)
    parser.add_argument("--num-detections-per-image", type=int, default=100)
    parser.add_argument("--detector", choices=["frcnn", "detr", "adamixer"],
                        default="frcnn",
                        help="checkpoint format: torchvision Faster R-CNN, "
                             "facebookresearch/detr DETR-R50, or a Flax "
                             "msgpack of our AdaMixer detector")
    parser.add_argument("--min-size", type=int, default=C.IMAGE_MIN_SIZE,
                        help="resize envelope (tests use small values)")
    parser.add_argument("--max-size", type=int, default=C.IMAGE_MAX_SIZE)
    parser.add_argument("--canvas", type=int, nargs=2, default=None,
                        help="fixed H W canvas override (must be /32)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.canvas is not None:
        args.canvas = tuple(args.canvas)

    dataset = HICODet(
        root=os.path.join(args.data_root, f"hico_20160224_det/images/{args.partition}"),
        anno_file=os.path.join(args.data_root, f"instances_{args.partition}.json"),
    )
    coco2hico = None
    mapping_path = os.path.join(args.data_root, "coco80tohico80.json")
    if os.path.exists(mapping_path):
        with open(mapping_path) as f:
            coco2hico = json.load(f)

    if args.detector == "adamixer":
        from flax import serialization

        with open(args.ckpt_path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        # train_detector --arch adamixer saves {config, params} so the decoder
        # geometry travels with the weights; bare-variables blobs (converted
        # mmdet checkpoints) keep the module defaults.
        overrides = {}
        if isinstance(blob, dict) and "config" in blob:
            overrides = {k: int(v) for k, v in blob["config"].items()
                         if k != "num_classes"}
            num_classes = int(blob["config"]["num_classes"])
            variables = {"params": blob["params"], **blob.get("extra", {})}
        else:
            num_classes = 80
            variables = blob
        detector = build_adamixer_detector_fn(
            variables, args.score_thresh, num_classes=num_classes,
            min_size=args.min_size, max_size=args.max_size,
            canvas=args.canvas, **overrides)
        cache_dir = os.path.join(args.cache_dir, args.partition)
        generate_model_detections(
            detector, dataset, cache_dir, score_thresh=args.score_thresh,
            label_map=None,  # AdaMixer here is trained on HICO ids directly
        )
        print(f"Cached {len(dataset)} detection files under {cache_dir}")
        return

    sd = load_checkpoint_state_dict(args.ckpt_path)
    if args.detector == "detr":
        from skghoi_tpu.detect.detr import load_torch_detr

        detector = build_detr_detector_fn(
            load_torch_detr(sd), args.score_thresh,
            min_size=args.min_size, max_size=args.max_size, canvas=args.canvas)
    else:
        detector = build_detector_fn(
            load_torch_fasterrcnn(sd), args.score_thresh, args.nms_thresh,
            args.num_detections_per_image,
            min_size=args.min_size, max_size=args.max_size, canvas=args.canvas,
        )
    cache_dir = os.path.join(args.cache_dir, args.partition)
    generate_model_detections(
        detector, dataset, cache_dir,
        score_thresh=args.score_thresh, label_map=coco2hico,
    )
    print(f"Cached {len(dataset)} detection files under {cache_dir}")


if __name__ == "__main__":
    main()
