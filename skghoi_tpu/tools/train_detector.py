"""Fine-tune the stage-1 detector on HICO-DET boxes.

Counterpart of the reference's DETR fine-tuning entry
(``hicodet/detections/main_detr.py``): trains the in-repo FPN detector on the
dataset's GT boxes (humans + objects), then optionally caches its detections
for stage 2.  Data-parallel over the local mesh like the HOI trainer.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def _first_occurrence_mask(boxes, labels, valid):
    """Mask keeping only the first occurrence of each (label, box) per image.

    ``boxes`` [B,N,4], ``labels`` [B,N], ``valid`` [B,N] -> bool [B,N].
    Coordinates are rounded to 0.1 px so float jitter can't split a
    duplicate.  Used to deduplicate HOI-pair-derived GT instances before
    Hungarian matching (the same person participates in many pairs).
    """
    rounded = np.round(np.asarray(boxes, np.float64), 1)
    labels = np.asarray(labels)
    valid = np.asarray(valid, bool)
    keep = np.zeros(valid.shape, bool)
    for i in range(valid.shape[0]):
        seen = set()
        for j in range(valid.shape[1]):
            if not valid[i, j]:
                continue
            key = (int(labels[i, j]), *rounded[i, j].tolist())
            if key not in seen:
                seen.add(key)
                keep[i, j] = True
    return keep


def build_argparser():
    p = argparse.ArgumentParser(description="Train the stage-1 detector")
    p.add_argument("--data-root", default="hicodet")
    p.add_argument("--partition", default="train2015")
    p.add_argument("--num-epochs", default=10, type=int)
    p.add_argument("--batch-size", default=4, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--cache-dir", default="./detector_checkpoints")
    p.add_argument("--print-interval", default=100, type=int)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-root", default=None,
                   help="directory for the synthetic dataset (shared with "
                        "later pipeline stages; default: fresh tmpdir)")
    # Architecture selection: dense anchor FPN head, or the reference's
    # actual stage-1 family (query-based AdaMixer with Hungarian set loss,
    # ``hicodet/detections/adamixer_preprocessing.py`` counterpart).
    p.add_argument("--arch", choices=["fpn", "adamixer"], default="fpn")
    p.add_argument("--num-queries", default=100, type=int)
    p.add_argument("--num-stages", default=6, type=int)
    p.add_argument("--content-dim", default=256, type=int)
    p.add_argument("--groups", default=4, type=int)
    p.add_argument("--in-points", default=32, type=int)
    p.add_argument("--out-points", default=128, type=int)
    p.add_argument("--ffn-dim", default=2048, type=int)
    return p


def train_adamixer(args, loader):
    """AdaMixer fine-tune loop: forward -> host Hungarian matching per
    (stage, image) -> jitted set-loss gradient step.  Saves a Flax msgpack
    checkpoint (config + params) that ``preprocess_detections --detector
    adamixer`` loads to cache stage-2 detections."""
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from skghoi_tpu import constants as C
    from skghoi_tpu.detect.adamixer import (
        AdaMixerDetector,
        compute_assignments,
        set_loss,
    )

    cfg = dict(
        num_classes=C.HICO_NUM_OBJECTS, num_queries=args.num_queries,
        num_stages=args.num_stages, content_dim=args.content_dim,
        groups=args.groups, in_points=args.in_points,
        out_points=args.out_points, ffn_dim=args.ffn_dim,
    )
    from skghoi_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model = AdaMixerDetector(**cfg)
    first_batch, _ = next(iter(loader))
    variables = dict(model.init(jax.random.PRNGKey(0), first_batch.images))
    params = variables.pop("params")
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    # Data-parallel like the FPN path: params/opt state replicated, batches
    # sharded on the leading axis; the Hungarian matching gathers the forward
    # outputs to the host (DETR-family convention), the gradient step runs
    # sharded with XLA-inserted psums.
    mesh = make_mesh()
    params = replicate(params, mesh)
    extra = replicate(variables, mesh)
    opt_state = replicate(opt_state, mesh)

    fwd = jax.jit(lambda p, e, imgs: model.apply({"params": p, **e}, imgs))

    @jax.jit
    def step(params, extra, opt_state, images, assignments, gt_boxes,
             gt_labels, gt_valid, hw):
        def loss_fn(p):
            out = model.apply({"params": p, **extra}, images)
            return set_loss(out, assignments, gt_boxes, gt_labels, gt_valid,
                            hw)["set_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    it = 0
    for epoch in range(args.num_epochs):
        loader.set_epoch(epoch)
        for hoi_batch, _ in loader:
            hoi_batch = shard_batch(hoi_batch, mesh)
            t = hoi_batch.targets
            gt_boxes = jnp.concatenate([t.boxes_h, t.boxes_o], axis=1)
            gt_labels = jnp.concatenate(
                [jnp.full_like(t.object, C.HICO_HUMAN_IDX), t.object], axis=1
            )
            gt_valid = jnp.concatenate([t.valid, t.valid], axis=1)
            # HICO-DET repeats the same person/object box across HOI pairs;
            # set-prediction training needs unique instances (only one query
            # can own each real box), so duplicates are masked invalid before
            # matching — shape-static, host-side like the Hungarian step.
            gt_valid = jnp.asarray(
                _first_occurrence_mask(
                    np.asarray(gt_boxes), np.asarray(gt_labels), np.asarray(gt_valid)
                )
            )
            hw = (float(hoi_batch.images.shape[1]), float(hoi_batch.images.shape[2]))
            out = fwd(params, extra, hoi_batch.images)
            assignments = jnp.asarray(
                compute_assignments(out, gt_boxes, gt_labels, gt_valid, hw)
            )
            params, opt_state, loss = step(
                params, extra, opt_state, hoi_batch.images, assignments,
                gt_boxes, gt_labels, gt_valid, hw,
            )
            it += 1
            if it % args.print_interval == 0:
                print(f"iter {it}: set_loss {float(loss):.4f}")
        os.makedirs(args.cache_dir, exist_ok=True)
        path = os.path.join(args.cache_dir, f"adamixer_{epoch:02d}.msgpack")
        # ``variables`` holds the non-trained collections (FrozenBatchNorm
        # batch_stats); the detector cannot be rebuilt without them.
        blob = {"config": cfg, "params": jax.device_get(params),
                "extra": jax.device_get(extra)}
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(blob))
        print(f"Saved {path}")
    print("Detector training complete.")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from skghoi_tpu import constants as C
    from skghoi_tpu.data.factory import DataFactory, HOILoader
    from skghoi_tpu.detect.detector import FPNDetector, detector_loss, generate_anchors
    from skghoi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from skghoi_tpu.train.checkpoint import save_checkpoint

    factory_kwargs = {}
    canvases = {(C.CANVAS_LANDSCAPE): None, (C.CANVAS_PORTRAIT): None}
    if args.synthetic:
        import tempfile

        from skghoi_tpu.data.synthetic import make_synthetic_hicodet

        root = args.synthetic_root or tempfile.mkdtemp(prefix="skghoi_det_")
        make_synthetic_hicodet(root, args.partition, num_images=8)
        args.data_root = root
        det_dir = os.path.join(root, f"detections_{args.partition}")
        factory_kwargs = dict(
            min_size=64, max_size=107, canvas_landscape=(64, 96), canvas_portrait=(96, 64)
        )
        args.num_epochs = min(args.num_epochs, 2)
        args.print_interval = 1
    else:
        det_dir = os.path.join(args.data_root, "detections", args.partition)

    n_dev = len(jax.devices())
    batch = args.batch_size * n_dev
    factory = DataFactory(
        "hicodet", args.partition, args.data_root, det_dir, flip=True, **factory_kwargs
    )
    loader = HOILoader(factory, batch, shuffle=True, with_targets=True)

    if args.arch == "adamixer":
        return train_adamixer(args, loader)

    model = FPNDetector()
    first_batch, _ = next(iter(loader))
    variables = dict(model.init(jax.random.PRNGKey(0), first_batch.images))
    params = variables.pop("params")
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    mesh = make_mesh()
    params = replicate(params, mesh)
    extra = replicate(variables, mesh)
    opt_state = replicate(opt_state, mesh)

    # One compiled step per canvas (anchors are canvas-static constants).
    steps = {}

    def get_step(canvas):
        if canvas not in steps:
            anchors = jnp.asarray(generate_anchors(canvas))

            @jax.jit
            def step(params, extra, opt_state, batch):
                def loss_fn(p):
                    t = batch.targets
                    boxes = jnp.concatenate([t.boxes_h, t.boxes_o], axis=1)
                    labels = jnp.concatenate(
                        [jnp.full_like(t.object, C.HICO_HUMAN_IDX), t.object], axis=1
                    )
                    valid = jnp.concatenate([t.valid, t.valid], axis=1)
                    logits, deltas = model.apply({"params": p, **extra}, batch.images)
                    losses = detector_loss(logits, deltas, anchors, boxes, labels, valid)
                    return losses["cls_loss"] + losses["box_loss"], losses

                (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, losses

            steps[canvas] = step
        return steps[canvas]

    it = 0
    for epoch in range(args.num_epochs):
        loader.set_epoch(epoch)
        for hoi_batch, _ in loader:
            canvas = hoi_batch.images.shape[1:3]
            hoi_batch = shard_batch(hoi_batch, mesh)
            params, opt_state, losses = get_step(tuple(canvas))(
                params, extra, opt_state, hoi_batch
            )
            it += 1
            if it % args.print_interval == 0:
                print(
                    f"iter {it}: cls {float(losses['cls_loss']):.4f} "
                    f"box {float(losses['box_loss']):.4f}"
                )
        os.makedirs(args.cache_dir, exist_ok=True)
        save_checkpoint(
            os.path.join(args.cache_dir, f"det_{epoch:02d}"),
            {"params": params, **extra},
            opt_state,
            epoch,
            it,
        )
    print("Detector training complete.")


if __name__ == "__main__":
    main()
