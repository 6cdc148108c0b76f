"""Train + evaluate a KGE model on an OpenKE-format benchmark.

TPU-native counterpart of the reference's ``OpenKE/train_transe_FB15K237.py``:

    TrainDataLoader(nbatches=100, threads=8, bern, filter, neg_ent=25)
    TransE(dim=200, p_norm=1, norm_flag=True)
    NegativeSampling + MarginLoss(5.0)
    Trainer(train_times=1000, alpha=1.0, SGD) ; Tester.run_link_prediction

Example (reads the benchmark read-only from a mounted path):

    python -m skghoi_tpu.tools.train_kge \
        --data /root/reference/OpenKE/benchmarks/FB15K237 \
        --model transe --dim 200 --margin 5.0 --epochs 1000 --alpha 1.0

Published parity target: TransE FB15K237 Hits@10(filter) ~ 0.476
(reference ``OpenKE/README.md:90``).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from skghoi_tpu.kge import (
    Analogy,
    ComplEx,
    DistMult,
    HolE,
    KGData,
    MarginLoss,
    NegativeSampling,
    RESCAL,
    RotatE,
    SigmoidLoss,
    SimplE,
    SoftplusLoss,
    Tester,
    Trainer,
    TransD,
    TransE,
    TransH,
    TransR,
)
from skghoi_tpu.kge.sampling import DeviceKG

def _trans_margin(a):
    """OpenKE margin_flag semantics: with a rank-based loss the model's
    forward is the raw distance (the margin lives in MarginLoss); with
    sigmoid/softplus losses the adversarial examples construct
    ``TransX(margin=m)`` so forward becomes ``margin - distance`` — the
    higher-is-better score those losses require
    (``examples/train_transe_WN18_adv_sigmoidloss.py:29``, ``Model.forward``)."""
    return a.margin if a.loss in ("sigmoid", "softplus") else None


MODELS = {
    "transe": lambda a, d: TransE(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim, p_norm=a.p_norm, norm_flag=not a.no_norm, margin=_trans_margin(a)),
    "transh": lambda a, d: TransH(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim, p_norm=a.p_norm, norm_flag=not a.no_norm, margin=_trans_margin(a)),
    "transr": lambda a, d: TransR(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim_e=a.dim, dim_r=a.dim, p_norm=a.p_norm, norm_flag=not a.no_norm, score_chunk=a.score_chunk, margin=_trans_margin(a)),
    "transd": lambda a, d: TransD(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim_e=a.dim, dim_r=a.dim, p_norm=a.p_norm, norm_flag=not a.no_norm, margin=_trans_margin(a)),
    "distmult": lambda a, d: DistMult(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim,
                                      margin=a.init_margin, epsilon=a.init_epsilon),
    "complex": lambda a, d: ComplEx(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim),
    "rescal": lambda a, d: RESCAL(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim),
    "analogy": lambda a, d: Analogy(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim),
    "simple": lambda a, d: SimplE(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim),
    "rotate": lambda a, d: RotatE(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim, margin=a.margin),
    "hole": lambda a, d: HolE(ent_tot=d.ent_tot, rel_tot=d.rel_tot, dim=a.dim),
}

LOSSES = {
    "margin": lambda a: MarginLoss(margin=a.margin, adv_temperature=a.adv_temperature),
    "sigmoid": lambda a: SigmoidLoss(adv_temperature=a.adv_temperature),
    "softplus": lambda a: SoftplusLoss(adv_temperature=a.adv_temperature),
}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native OpenKE-parity KGE training")
    p.add_argument("--data", required=True, help="benchmark dir with *2id.txt files")
    p.add_argument("--example", default=None, help="preset config name (see kge/examples.py)")
    p.add_argument("--model", default="transe", choices=sorted(MODELS))
    p.add_argument("--loss", default="margin", choices=sorted(LOSSES))
    p.add_argument("--dim", type=int, default=200)
    p.add_argument("--p-norm", type=int, default=1)
    p.add_argument("--no-norm", action="store_true", help="disable score-time L2 normalization")
    p.add_argument("--margin", type=float, default=5.0)
    p.add_argument("--adv-temperature", type=float, default=None)
    p.add_argument("--nbatches", type=int, default=100)
    p.add_argument("--neg-ent", type=int, default=25)
    p.add_argument("--bern", action="store_true")
    p.add_argument("--no-filter", action="store_true")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--alpha", type=float, default=1.0, help="learning rate")
    p.add_argument("--opt", default="sgd", choices=["sgd", "adam", "adagrad", "adadelta"])
    p.add_argument("--regul-rate", type=float, default=0.0)
    p.add_argument("--l3-regul-rate", type=float, default=0.0)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard per-step sampling over all local devices and "
                        "pmean gradients (DDP counterpart; no-op on one chip)")
    p.add_argument("--sampling-mode", default="normal", choices=["normal", "oneside"],
                   help="'oneside': per-row corruption side + folded scoring "
                        "(the reference's cross-mode structure; ~3x less HBM "
                        "traffic per step)")
    p.add_argument("--init-margin", type=float, default=None,
                   help="DistMult: uniform init range (margin+epsilon)/dim instead of Xavier")
    p.add_argument("--init-epsilon", type=float, default=None)
    p.add_argument("--score-chunk", type=int, default=None,
                   help="TransR: chunked+rematerialized scoring (memory bound)")
    p.add_argument("--transe-init-epochs", type=int, default=0,
                   help="TransR published recipe: pretrain TransE this many "
                        "epochs (margin 5.0, alpha 0.5, SGD) and copy its "
                        "entity/relation tables in (train_transr_FB15K237.py)")
    p.add_argument("--json-out", default=None,
                   help="append the JSON result line to this file")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None, help="save final params here")
    p.add_argument("--load-checkpoint", default=None,
                   help="restore params from a prior --checkpoint file before "
                        "(optionally zero) further training; with --epochs 0 "
                        "this is an eval-only run of a committed checkpoint")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (hedge runs while the TPU "
                        "tunnel is down; env vars cannot override the "
                        "sitecustomize backend pin, only jax.config can)")
    p.add_argument("--eval-chunk", type=int, default=16)
    p.add_argument("--type-constrain", action="store_true")
    p.add_argument("--skip-eval", action="store_true")
    p.add_argument("--json", action="store_true", help="print one JSON result line")
    return p


def main(argv=None):
    parser = build_argparser()
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.example:
        from skghoi_tpu.kge.examples import EXAMPLES

        preset = EXAMPLES[args.example]
        explicit = {
            a.dest
            for a in parser._actions
            if parser.get_default(a.dest) != getattr(args, a.dest, None)
        }
        for k, v in preset.items():
            if k not in explicit:
                setattr(args, k, v)
        print(f"Using example config '{args.example}': {preset}")
    data = KGData.load(args.data, with_type_constrain=args.type_constrain)
    kg = DeviceKG.from_kgdata(data)
    print(
        f"Loaded {args.data}: {data.ent_tot} entities, {data.rel_tot} relations, "
        f"{data.train_total} train / {len(data.valid)} valid / {len(data.test)} test triples"
    )

    model = MODELS[args.model](args, data)
    params = model.init(jax.random.PRNGKey(args.seed), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])

    if args.load_checkpoint:
        from flax import serialization

        with open(args.load_checkpoint, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print(f"Loaded checkpoint {args.load_checkpoint}")

    if args.transe_init_epochs > 0:
        # Published TransR recipe (train_transr_FB15K237.py:24-56): 1 epoch of
        # TransE(dim, p1, norm) with MarginLoss(5.0)/SGD(0.5), then copy the
        # entity/relation tables into TransR (transfer matrices stay identity).
        print(f"Pretraining TransE for {args.transe_init_epochs} epoch(s) to seed {args.model}")
        pre_model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=args.dim,
                           p_norm=args.p_norm, norm_flag=True)
        pre_params = pre_model.init(
            jax.random.PRNGKey(args.seed), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1]
        )
        pre_strategy = NegativeSampling(loss=MarginLoss(margin=5.0))
        pre = Trainer(
            pre_model, pre_params, pre_strategy, kg,
            nbatches=args.nbatches, neg_rate=args.neg_ent, bern=args.bern,
            filtered=not args.no_filter, train_times=args.transe_init_epochs,
            alpha=0.5, opt_method="sgd", seed=args.seed,
        )
        pre_params = pre.run()
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        p["params"]["ent_embeddings"]["embedding"] = pre_params["params"]["ent_embeddings"]["embedding"]
        p["params"]["rel_embeddings"]["embedding"] = pre_params["params"]["rel_embeddings"]["embedding"]
        params = p

    strategy = NegativeSampling(
        loss=LOSSES[args.loss](args), regul_rate=args.regul_rate,
        l3_regul_rate=args.l3_regul_rate,
    )

    if args.epochs > 0:
        trainer = Trainer(
            model, params, strategy, kg,
            nbatches=args.nbatches, neg_rate=args.neg_ent, bern=args.bern,
            filtered=not args.no_filter, train_times=args.epochs,
            alpha=args.alpha, opt_method=args.opt, seed=args.seed,
            sampling_mode=args.sampling_mode,
            mesh=__import__("skghoi_tpu.parallel.mesh", fromlist=["make_mesh"]).make_mesh()
            if args.data_parallel else None,
        )
        t0 = time.time()
        params = trainer.run()
        train_time = time.time() - t0
        steps = args.epochs * args.nbatches
        print(f"Training: {train_time:.1f}s for {steps} steps ({steps / max(train_time, 1e-9):.1f} steps/s)")
        if args.checkpoint:
            trainer.save_checkpoint(args.checkpoint)
    else:
        train_time, steps = 0.0, 0
        print("Training skipped (--epochs 0): evaluating loaded/initial params")
        if args.checkpoint:  # e.g. re-materialize a loaded ledger checkpoint
            from flax import serialization

            os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)
            with open(args.checkpoint, "wb") as f:
                f.write(serialization.to_bytes(params))
            print(f"Saved {args.checkpoint}")

    if not args.skip_eval:
        tester = Tester(model, params, data, chunk_size=args.eval_chunk)
        t0 = time.time()
        res = tester.run_link_prediction(type_constrain=args.type_constrain)
        eval_time = time.time() - t0
        print(f"Evaluation: {eval_time:.1f}s for {2 * len(data.test)} ranking queries")
        if args.json or args.json_out:
            line = json.dumps({
                "model": args.model, "data": args.data,
                "example": args.example, "seed": args.seed,
                "platform": jax.default_backend(),
                "cli": vars(args),
                "mrr": res.mrr, "mr": res.mr,
                "hit10": res.hit10, "hit3": res.hit3, "hit1": res.hit1,
                "train_seconds": train_time, "steps_per_second": steps / max(train_time, 1e-9),
            })
            if args.json:
                print(line)
            if args.json_out:
                with open(args.json_out, "a") as f:
                    f.write(line + "\n")
        return res
    return None


if __name__ == "__main__":
    main()
