"""Per-image diagnosis: dump box-pair scores and draw an overlay.

Counterpart of ``diagnosis/demo.py:49-129``: run the network on one image
from the dataset, print every detected human-object pair with its top verb
scores, and save a matplotlib overlay of the pair boxes.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="SCG single-image demo")
    p.add_argument("--data-root", default="hicodet")
    p.add_argument("--detection-dir", default="hicodet/detections/test2015")
    p.add_argument("--partition", default="test2015")
    p.add_argument("--index", default=0, type=int, help="dataset index to run")
    p.add_argument("--model-path", default="")
    p.add_argument("--top-k", default=5, type=int)
    p.add_argument("--output", default="demo_overlay.png")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from skghoi_tpu.data.factory import DataFactory, collate
    from skghoi_tpu.eval.hoi_eval import jax_to_numpy, unpack_image_results
    from skghoi_tpu.models import SpatiallyConditionedGraph
    from skghoi_tpu.train.checkpoint import load_checkpoint

    factory_kwargs = {}
    if args.synthetic:
        import tempfile

        from skghoi_tpu.data.synthetic import make_synthetic_hicodet

        root = tempfile.mkdtemp(prefix="skghoi_demo_")
        make_synthetic_hicodet(root, args.partition, num_images=4)
        args.data_root = root
        args.detection_dir = os.path.join(root, f"detections_{args.partition}")
        factory_kwargs = dict(
            min_size=64, max_size=107, canvas_landscape=(64, 96), canvas_portrait=(96, 64)
        )

    factory = DataFactory(
        "hicodet", args.partition, args.data_root, args.detection_dir, **factory_kwargs
    )
    sample = factory[args.index]
    batch = collate([sample], with_targets=False)

    model = SpatiallyConditionedGraph()
    ovm = factory.dataset.object_verb_mask()
    variables = model.init(jax.random.PRNGKey(0), batch, ovm, training=False)
    if args.model_path:
        variables = load_checkpoint(args.model_path, variables)["model_state_dict"]

    out = jax_to_numpy(model.apply(variables, batch, ovm, training=False))
    res = unpack_image_results(out, batch, 0)

    # Group scores per pair, print top-k verbs each.
    verbs = factory.dataset.verbs
    pairs = {}
    for (x, y), k, s in zip(res["pair_index"], res["prediction"], res["scores"]):
        pairs.setdefault((int(x), int(y)), []).append((float(s), int(k)))
    print(f"Image {factory.dataset.filename(args.index)}: {len(pairs)} box pairs")
    for (x, y), entries in sorted(pairs.items()):
        entries.sort(reverse=True)
        tops = ", ".join(f"{verbs[k]}={s:.3f}" for s, k in entries[: args.top_k])
        print(f"  pair (h{x}, o{y}) object={factory.dataset.objects[int(np.asarray(out.object_class)[0, y])]}: {tops}")

    # Overlay
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    image, _ = factory.dataset[args.index]
    fig, ax = plt.subplots(1)
    ax.imshow(image)
    for (x, y), entries in pairs.items():
        bh = res["boxes_h"][np.nonzero((res["pair_index"] == [x, y]).all(1))[0][0]]
        bo = res["boxes_o"][np.nonzero((res["pair_index"] == [x, y]).all(1))[0][0]]
        ax.add_patch(Rectangle((bh[0], bh[1]), bh[2] - bh[0], bh[3] - bh[1], fill=False, color="lime"))
        ax.add_patch(Rectangle((bo[0], bo[1]), bo[2] - bo[0], bo[3] - bo[1], fill=False, color="red"))
    fig.savefig(args.output, dpi=120)
    print("Saved overlay to", args.output)


if __name__ == "__main__":
    main()
