"""Pretrain TransH on the HOI knowledge graph and export head embeddings.

The reference's evident design (SURVEY.md §2.5-1): pretrain TransH on
(person, verb, object) triples with OpenKE (the ``hoi_linearH`` example
config) and use the embeddings inside the interaction head.  The committed
code never got there (the TransH module was re-created every forward); this
tool completes the path:

1. build the HOI KG from HICO-DET annotations — one (human-class, verb,
   object-class) triple per annotated interaction class, with the class
   correspondence as the schema;
2. train TransH on it with the on-device KGE trainer;
3. save the embeddings in a form
   :func:`load_pretrained_transh` injects into an SCG parameter tree
   (``interaction_head/box_pair_head/transh``).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_hoi_triples(class_corr, human_idx: int):
    """(h=human class, t=object class, r=verb) triples from the 600-class table."""
    triples = np.asarray(
        [[human_idx, obj, verb] for _, obj, verb in class_corr], np.int64
    )
    return np.unique(triples, axis=0)


def load_pretrained_transh(scg_variables: dict, kge_params: dict) -> dict:
    """Copy TransH embedding tables from a KGE checkpoint into SCG variables."""
    import flax

    flat = flax.traverse_util.flatten_dict(scg_variables)
    src = flax.traverse_util.flatten_dict(kge_params)

    def find(name):
        for k, v in src.items():
            if name in k and k[-1] == "embedding":
                return v
        raise KeyError(name)

    for table in ("ent_embeddings", "rel_embeddings", "norm_vector"):
        key = (
            "params", "interaction_head", "box_pair_head", "transh", table, "embedding",
        )
        assert key in flat, f"SCG tree missing {key}"
        new = find(table)
        assert flat[key].shape == new.shape, (table, flat[key].shape, new.shape)
        flat[key] = new
    return flax.traverse_util.unflatten_dict(flat)


def main(argv=None):
    p = argparse.ArgumentParser(description="Pretrain TransH on the HOI KG")
    p.add_argument("--data-root", default="hicodet")
    p.add_argument("--partition", default="train2015")
    p.add_argument("--dim", default=50, type=int, help="must match the head (50)")
    p.add_argument("--margin", default=4.0, type=float, help="hoi_linearH margin")
    p.add_argument("--epochs", default=500, type=int)
    p.add_argument("--neg-ent", default=8, type=int)
    p.add_argument("--alpha", default=0.5, type=float)
    p.add_argument("--output", default="transh_hoi.ckpt")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from skghoi_tpu import constants as C
    from skghoi_tpu.data.hicodet import HICODet
    from skghoi_tpu.kge import KGData, MarginLoss, NegativeSampling, Trainer, TransH
    from skghoi_tpu.kge.sampling import DeviceKG

    if args.synthetic:
        import tempfile

        from skghoi_tpu.data.synthetic import make_synthetic_hicodet

        root = tempfile.mkdtemp(prefix="skghoi_kg_")
        make_synthetic_hicodet(root, args.partition, num_images=4)
        args.data_root = root

    dataset = HICODet(
        root=os.path.join(args.data_root, "hico_20160224_det/images", args.partition),
        anno_file=os.path.join(args.data_root, f"instances_{args.partition}.json"),
    )
    triples = build_hoi_triples(dataset.class_corr, C.HICO_HUMAN_IDX)
    print(f"HOI KG: {len(triples)} triples, {C.HICO_NUM_OBJECTS} entities, "
          f"{C.HICO_NUM_VERBS} relations")

    data = KGData.build(C.HICO_NUM_OBJECTS, C.HICO_NUM_VERBS, triples)
    kg = DeviceKG.from_kgdata(data)
    model = TransH(
        ent_tot=C.HICO_NUM_OBJECTS, rel_tot=C.HICO_NUM_VERBS, dim=args.dim,
        p_norm=C.TRANSH_P_NORM, norm_flag=C.TRANSH_NORM_FLAG,
    )
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])
    trainer = Trainer(
        model, params, NegativeSampling(loss=MarginLoss(margin=args.margin)), kg,
        nbatches=4, neg_rate=args.neg_ent, bern=True, train_times=args.epochs,
        alpha=args.alpha, opt_method="sgd",
    )
    trainer.run()
    trainer.save_checkpoint(args.output)
    print(f"Saved TransH embeddings to {args.output}; inject with "
          f"skghoi_tpu.tools.pretrain_transh_hoi.load_pretrained_transh "
          f"(or --transh-init in train_hicodet).")


if __name__ == "__main__":
    main()
