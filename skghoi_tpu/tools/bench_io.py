"""End-to-end input-pipeline benchmark: on-disk JPEGs -> device batches.

Every prior throughput figure fed pre-built device batches; this measures the
path the reference's engine actually pays (``utils.py:200-229``: DataLoader
decode/resize/collate feeding the train loop):

  1. loader: JPEG decode -> resize -> canvas pad -> collate -> host->device
     transfer, through :class:`HOILoader`'s threaded prefetch, at the real
     832x1344 geometry.
  2. ``--train``: the same loader overlapped with the real SCG train step
     (fwd + 3 losses + AdamW), i.e. images/s INCLUDING input.

Synthetic on-disk images are generated at HICO-like resolutions so the
decode/resize cost is realistic.  Prints one JSON line per section.

Usage:
    python -m skghoi_tpu.tools.bench_io [--num-images 64] [--batch-size 8]
        [--num-workers 4] [--epochs 3] [--train] [--cpu] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import jax


def build_argparser():
    p = argparse.ArgumentParser(description="input-pipeline-included benchmark")
    p.add_argument("--num-images", default=64, type=int)
    p.add_argument("--batch-size", default=8, type=int, help="global batch")
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--prefetch", default=2, type=int)
    p.add_argument("--epochs", default=3, type=int,
                   help="epoch 1 warms caches/compile; report the rest")
    p.add_argument("--image-size", default=[480, 640], nargs=2, type=int,
                   help="on-disk H W (HICO-like)")
    p.add_argument("--train", action="store_true",
                   help="also run the loader-overlapped SCG train step")
    p.add_argument("--device-resize", action="store_true",
                   help="raw-uint8 loader + on-device bilinear resize/canvas "
                        "(data/device_preprocess) instead of host resize")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="tiny transform geometry (CI smoke, not a benchmark)")
    p.add_argument("--root", default=None, help="reuse an existing dataset dir")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from skghoi_tpu.data.factory import DataFactory, HOILoader
    from skghoi_tpu.data.synthetic import make_synthetic_hicodet

    part = "train2015"
    root = args.root or tempfile.mkdtemp(prefix="skghoi_io_")
    if not os.path.isdir(os.path.join(root, "hico_20160224_det")):
        make_synthetic_hicodet(root, part, num_images=args.num_images,
                               image_size=tuple(args.image_size))
    factory_kwargs = {}
    if args.small:
        factory_kwargs = dict(min_size=64, max_size=107,
                              canvas_landscape=(64, 96), canvas_portrait=(96, 64))
    if args.device_resize:
        factory_kwargs["device_resize"] = True
        if args.small:
            factory_kwargs["raw_canvas_landscape"] = (480, 640)
            factory_kwargs["raw_canvas_portrait"] = (640, 480)
    factory = DataFactory(
        "hicodet", part, root, os.path.join(root, f"detections_{part}"),
        flip=True, **factory_kwargs,
    )
    loader = HOILoader(factory, args.batch_size, shuffle=True,
                       with_targets=True, num_workers=args.num_workers,
                       prefetch=args.prefetch)

    dev = jax.devices()[0]
    n_img = len(factory)
    epoch_rates = []
    for ep in range(args.epochs):
        loader.set_epoch(ep)
        t0 = time.time()
        # Short batches are padded by repeating an already-decoded sample;
        # count unique dataset indices so padding can't inflate img/s.
        seen_idx = set()
        for batch, indices in loader:
            if args.device_resize:
                from skghoi_tpu.data.device_preprocess import device_resize_canvas

                canvas = (factory.canvas_landscape
                          if batch.images.shape[1] <= batch.images.shape[2]
                          else factory.canvas_portrait)
                imgs = jax.device_put(batch.images, dev)
                device_resize_canvas(
                    imgs, batch.original_sizes, batch.image_sizes, canvas
                ).block_until_ready()
            else:
                # include the host->device transfer the train step would pay
                jax.device_put(batch.images, dev).block_until_ready()
            seen_idx.update(int(i) for i in indices)
        dt = time.time() - t0
        epoch_rates.append(len(seen_idx) / dt)
    steady = epoch_rates[1:] or epoch_rates
    print(json.dumps({
        "section": "loader", "platform": jax.default_backend(),
        "num_images": n_img, "batch": args.batch_size,
        "num_workers": args.num_workers, "image_size": list(args.image_size),
        "small": args.small, "device_resize": args.device_resize,
        "epoch_imgs_per_s": [round(r, 2) for r in epoch_rates],
        "imgs_per_s": round(float(np.median(steady)), 2),
    }), flush=True)

    if not args.train:
        return

    from skghoi_tpu.models import SpatiallyConditionedGraph
    from skghoi_tpu.train.engine import LearningEngine

    model = SpatiallyConditionedGraph()
    first, _ = next(iter(loader))
    if args.device_resize:
        from skghoi_tpu.data.device_preprocess import prepare_batch

        first = prepare_batch(first, factory)
    variables = model.init(
        jax.random.PRNGKey(0), first, factory.dataset.object_verb_mask(),
        training=True, rng=jax.random.PRNGKey(0),
    )
    engine = LearningEngine(
        model, variables, loader,
        object_verb_mask=factory.dataset.object_verb_mask(),
        print_interval=10_000, cache_dir=os.path.join(root, "ckpt_bench"),
    )
    train_rates = []
    epoch_walls = []
    for ep in range(args.epochs):
        t0 = time.time()
        engine.run(1)
        epoch_walls.append(time.time() - t0)
        train_rates.append(n_img / epoch_walls[-1])
    steady = train_rates[1:] or train_rates
    steady_wall = float(np.median(epoch_walls[1:] or epoch_walls))
    print(json.dumps({
        "section": "train_e2e", "platform": jax.default_backend(),
        "num_images": n_img, "batch": args.batch_size,
        "num_workers": args.num_workers, "small": args.small,
        "epoch_imgs_per_s": [round(r, 2) for r in train_rates],
        "imgs_per_s": round(float(np.median(steady)), 2),
        # First epoch pays the train-step jit compile; the difference vs a
        # steady epoch is the committed time-to-first-step record
        # (VERDICT r4 #7: track compile cost, it gates driver budgets).
        "first_epoch_seconds": round(epoch_walls[0], 1),
        "compile_overhead_seconds": round(epoch_walls[0] - steady_wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
