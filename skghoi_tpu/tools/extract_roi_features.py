"""Pre-extract pooled RoI features for cached detections.

A working version of the reference's ``detections_convert.py`` (which is a
dead scratch file with a syntax error at ``:82``): run the backbone once per
image, RoIAlign the cached detection boxes, and store ``[N, 7, 7, 256]``
features + metadata per image as ``.npz``, so stage-2 head experiments can
skip the backbone entirely.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Pre-extract RoI features")
    p.add_argument("--data-root", default="hicodet")
    p.add_argument("--detection-dir", default="hicodet/detections/train2015")
    p.add_argument("--partition", default="train2015")
    p.add_argument("--output-dir", default="roi_features")
    p.add_argument("--batch-size", default=4, type=int)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max-batches", default=None, type=int)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from skghoi_tpu.data.factory import DataFactory, HOILoader
    from skghoi_tpu.models.backbone import DetectorBackbone
    from skghoi_tpu.models.interaction_head import filter_detections
    from skghoi_tpu.ops.roi_align import multiscale_roi_align

    factory_kwargs = {}
    if args.synthetic:
        import tempfile

        from skghoi_tpu.data.synthetic import make_synthetic_hicodet

        root = tempfile.mkdtemp(prefix="skghoi_roi_")
        make_synthetic_hicodet(root, args.partition, num_images=4)
        args.data_root = root
        args.detection_dir = os.path.join(root, f"detections_{args.partition}")
        factory_kwargs = dict(
            min_size=64, max_size=107, canvas_landscape=(64, 96), canvas_portrait=(96, 64)
        )

    factory = DataFactory(
        "hicodet", args.partition, args.data_root, args.detection_dir, **factory_kwargs
    )
    loader = HOILoader(factory, args.batch_size, shuffle=False, with_targets=False)
    os.makedirs(args.output_dir, exist_ok=True)

    backbone = DetectorBackbone()
    first_batch, _ = next(iter(loader))
    variables = backbone.init(jax.random.PRNGKey(0), first_batch.images)

    @jax.jit
    def extract(variables, batch):
        feats = backbone.apply(variables, batch.images)
        dets = filter_detections(
            batch.det_boxes, batch.det_labels, batch.det_scores, batch.det_valid
        )
        pooled = jax.vmap(lambda f, b: multiscale_roi_align(f, b))(feats, dets.boxes)
        return pooled, dets

    count = 0
    for b_num, (batch, indices) in enumerate(loader):
        if args.max_batches is not None and b_num >= args.max_batches:
            break
        pooled, dets = extract(variables, batch)
        pooled = np.asarray(pooled)
        for slot, ds_index in enumerate(indices):
            n = int(dets.n[slot])
            np.savez_compressed(
                os.path.join(
                    args.output_dir, factory.dataset.filename(ds_index).replace(".jpg", ".npz")
                ),
                features=pooled[slot, :n],
                boxes=np.asarray(dets.boxes[slot, :n]),
                labels=np.asarray(dets.labels[slot, :n]),
                scores=np.asarray(dets.scores[slot, :n]),
                n_h=int(dets.n_h[slot]),
            )
            count += 1
    print(f"Extracted RoI features for {count} images into {args.output_dir}")


if __name__ == "__main__":
    main()
