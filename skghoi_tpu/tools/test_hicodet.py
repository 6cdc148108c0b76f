"""Evaluate a trained SCG checkpoint on HICO-DET (full/rare/non-rare mAP).

Counterpart of ``test/adamixer_transH_spatital_r50_test.py``: loads the
annotation-derived rare split (classes with <10 GT pairs, ``:30-33``), runs
batched inference over cached detections, and prints the three means
(``:66-70``).  Unlike the reference, batch size is not pinned to 1.
"""

from __future__ import annotations

import argparse

import jax


def build_argparser():
    p = argparse.ArgumentParser(description="Evaluate SCG on HICO-DET")
    p.add_argument("--data-root", default="hicodet")
    p.add_argument("--detection-dir", default="hicodet/detections/test2015")
    p.add_argument("--partition", default="test2015")
    p.add_argument("--model-path", default="", help="checkpoint to load")
    p.add_argument("--batch-size", default=4, type=int)
    p.add_argument("--num-iter", default=2, type=int)
    p.add_argument("--box-score-thresh", default=0.2, type=float)
    p.add_argument("--max-batches", default=None, type=int)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-root", default=None,
                   help="reuse/create the synthetic dataset here (lets the "
                        "chained CLI tools share one dataset)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import os

    from skghoi_tpu.data.factory import DataFactory, HOILoader
    from skghoi_tpu.eval.hoi_eval import evaluate_hicodet
    from skghoi_tpu.models import SpatiallyConditionedGraph
    from skghoi_tpu.parallel.train_step import build_eval_step
    from skghoi_tpu.train.checkpoint import load_checkpoint

    factory_kwargs = {}
    if args.synthetic:
        import tempfile

        from skghoi_tpu.data.synthetic import make_synthetic_hicodet

        root = args.synthetic_root or tempfile.mkdtemp(prefix="skghoi_eval_synth_")
        make_synthetic_hicodet(root, args.partition, num_images=8)
        args.data_root = root
        args.detection_dir = os.path.join(root, f"detections_{args.partition}")
        factory_kwargs = dict(
            min_size=64, max_size=107, canvas_landscape=(64, 96), canvas_portrait=(96, 64)
        )

    factory = DataFactory(
        "hicodet", args.partition, args.data_root, args.detection_dir, **factory_kwargs
    )
    loader = HOILoader(factory, args.batch_size, shuffle=False, with_targets=False)

    model = SpatiallyConditionedGraph(
        num_iterations=args.num_iter, box_score_thresh=args.box_score_thresh
    )
    ovm = factory.dataset.object_verb_mask()

    first_batch, _ = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), first_batch, ovm, training=False)
    if args.model_path:
        restored = load_checkpoint(args.model_path, variables, None)
        variables = restored["model_state_dict"]
        print(f"Loaded checkpoint {args.model_path}")
    else:
        print("WARNING: no --model-path given; evaluating a random-init model.")

    eval_step_raw = build_eval_step(model, ovm)
    variables_split = dict(variables)
    params = variables_split.pop("params")

    def eval_step(p, batch):
        return eval_step_raw(params, variables_split, batch)

    result = evaluate_hicodet(
        eval_step, params, loader, factory.dataset, max_batches=args.max_batches
    )
    print(
        f"The mAP is {result['full']:.4f}, rare: {result['rare']:.4f}, "
        f"none-rare: {result['non_rare']:.4f}"
    )
    return result


if __name__ == "__main__":
    main()
