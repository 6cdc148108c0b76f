"""Per-stage timing of the flagship network on the attached chip.

Splits the training step the profile-driven way (round-3 MFU campaign): each
piece compiles as its own XLA program and is timed as a device-side chained
``fori_loop`` (every iteration's input depends on a scalar folded from every
output of the previous one, so nothing is dead-code-eliminated and the
measurement is immune to async-dispatch artifacts — the tunnel reports
impossible sub-ms times for unchained loops).  FLOPs come from
``cost_analysis`` of the single-step program so per-stage utilization is
visible.

    python -m skghoi_tpu.tools.stage_profile [--batch 8] [--part all]

Parts: ``backbone`` (backbone+FPN fwd and fwd+bwd), ``stages`` (each ResNet
stage fwd and fwd+bwd on inputs of its real shape), ``update`` (AdamW +
NaN-guard overhead on the real params tree), ``head`` (RoIAlign fwd/bwd).
Prints one JSON document.
"""

from __future__ import annotations

import argparse
import json
import time


def _leafsum(tree):
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(tree)
    )


def _chain_time(step, carry0, iters=10, consts=()):
    """step: (carry, *consts) -> carry (same structure).  Seconds/iteration.

    ``consts`` are passed as real jit arguments — closing over them would
    embed them as HLO literals, and a backbone-sized constant blob overflows
    the remote-compile request (HTTP 413 through the tunnel).
    """
    import jax

    @jax.jit
    def chain(c, consts, n):
        c = jax.lax.fori_loop(0, n, lambda i, cc: step(cc, *consts), c)
        return _leafsum(c)

    # Sync by FETCHING the scalar — through the async tunnel,
    # block_until_ready alone returns without waiting for device work.
    float(chain(carry0, consts, 1))  # compile + warm
    t0 = time.perf_counter()
    float(chain(carry0, consts, 1))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(carry0, consts, iters + 1))
    t_many = time.perf_counter() - t0
    return (t_many - t_one) / iters


def _flops_of(fn, *args):
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    return float(cost.get("flops", 0.0))


def _fwd_bwd_entry(name, module, x, iters=10):
    """Chained fwd and fwd+bwd timing of module.apply on input x."""
    import jax
    import jax.numpy as jnp

    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)

    def fwd_scalar(v, xx):
        return _leafsum(module.apply(v, xx))

    def fwd_step(carry, variables, x):
        s = fwd_scalar(variables, x + carry * jnp.asarray(1e-20, x.dtype))
        return s.astype(x.dtype)

    t_f = _chain_time(fwd_step, jnp.asarray(0.0, x.dtype), iters,
                      consts=(variables, x))

    extra = {k: v for k, v in variables.items() if k != "params"}

    def grad_scalar(params, extra, xx):
        g = jax.grad(lambda p: fwd_scalar({"params": p, **extra}, xx))(params)
        return _leafsum(g)

    def bwd_step(carry, params, extra, x):
        return grad_scalar(
            params, extra, x + carry * jnp.asarray(1e-20, x.dtype)
        ).astype(x.dtype)

    t_g = _chain_time(bwd_step, jnp.asarray(0.0, x.dtype), iters,
                      consts=(variables["params"], extra, x))
    return {
        name: {
            "fwd_ms": t_f * 1e3,
            "fwd_tflops": _flops_of(fwd_scalar, variables, x) / 1e12,
            "fwd_bwd_ms": t_g * 1e3,
            "fwd_bwd_tflops": _flops_of(grad_scalar, variables["params"], extra, x) / 1e12,
        }
    }


def profile(batch=8, canvas=(832, 1344), parts=("backbone", "stages", "update", "head")):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skghoi_tpu.models.backbone import DetectorBackbone
    from skghoi_tpu.models.resnet import Bottleneck, FrozenBatchNorm, StemConv

    h, w = canvas
    out: dict = {"batch": batch, "canvas": [h, w]}
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    if "backbone" in parts:
        x = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)), jnp.float32)
        out.update(_fwd_bwd_entry("backbone_fpn", DetectorBackbone(dtype=dt), x))

    if "stages" in parts:
        import flax.linen as nn

        class Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = StemConv(dtype=dt, name="stem_conv")(x)
                x = FrozenBatchNorm(dtype=dt, name="stem_bn")(x)
                x = nn.relu(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        class Stage(nn.Module):
            blocks: int
            width: int
            first_stride: int

            @nn.compact
            def __call__(self, x):
                for b in range(self.blocks):
                    x = Bottleneck(self.width, strides=self.first_stride if b == 0 else 1,
                                   dtype=dt, name=f"block{b}")(x)
                return x

        h4, w4 = h // 4, w // 4
        specs = [
            ("stem", Stem(), (batch, h, w, 3)),
            ("layer1", Stage(3, 64, 1), (batch, h4, w4, 64)),
            ("layer2", Stage(4, 128, 2), (batch, h4, w4, 256)),
            ("layer3", Stage(6, 256, 2), (batch, h4 // 2, w4 // 2, 512)),
            ("layer4", Stage(3, 512, 2), (batch, h4 // 4, w4 // 4, 1024)),
        ]
        for name, mod, shape in specs:
            x = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32 if name == "stem" else dt)
            out.update(_fwd_bwd_entry(name, mod, x))

    if "update" in parts:
        import optax

        from __graft_entry__ import _make_batch, _verb_mask
        from skghoi_tpu.models import SpatiallyConditionedGraph

        model = SpatiallyConditionedGraph(dtype=dt)
        b1 = _make_batch(1, (64, 96), with_targets=True)
        ovm = _verb_mask()
        variables = jax.jit(lambda r, b: model.init(r, b, ovm, training=True))(
            jax.random.PRNGKey(0), b1
        )
        params = variables["params"]
        grads0 = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-9), params)
        tx = optax.adamw(1e-4)
        opt_state0 = jax.jit(tx.init)(params)

        def plain_step(carry, grads0):
            p, s = carry
            updates, s = tx.update(grads0, s, p)
            return optax.apply_updates(p, updates), s

        def guarded_step(carry, grads0):
            p, s = carry
            ok = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads0)]
            ))
            updates, ns = tx.update(grads0, s, p)
            np_ = optax.apply_updates(p, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            return keep(np_, p), keep(ns, s)

        out["adamw_plain_ms"] = _chain_time(
            plain_step, (params, opt_state0), 20, consts=(grads0,)) * 1e3
        out["adamw_guarded_ms"] = _chain_time(
            guarded_step, (params, opt_state0), 20, consts=(grads0,)) * 1e3
        out["n_params"] = int(
            sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
        )

    if "head" in parts:
        from __graft_entry__ import _make_batch
        from skghoi_tpu.ops.pallas_roi_align import roi_align_auto

        b = _make_batch(batch, canvas)
        feats = tuple(
            jnp.asarray(rng.uniform(size=(batch, h // s, w // s, 256)), dt)
            for s in (4, 8, 16, 32)
        )
        boxes = b.det_boxes[:, :30]

        def roi_scalar(feats, boxes):
            return jnp.sum(roi_align_auto(feats, boxes).astype(jnp.float32))

        def roi_step(carry, feats, boxes):
            f2 = tuple(f + carry.astype(f.dtype) * 1e-20 for f in feats)
            return roi_scalar(f2, boxes)

        out["roi_fwd_ms"] = _chain_time(
            roi_step, jnp.asarray(0.0), 10, consts=(feats, boxes)) * 1e3

        def roi_bwd_step(carry, feats, boxes):
            f2 = tuple(f + carry.astype(f.dtype) * 1e-20 for f in feats)
            g = jax.grad(lambda ff: roi_scalar(ff, boxes))(f2)
            return _leafsum(g)

        out["roi_fwd_bwd_ms"] = _chain_time(
            roi_bwd_step, jnp.asarray(0.0), 10, consts=(feats, boxes)) * 1e3

    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--part", default="all")
    args = p.parse_args(argv)
    parts = ("backbone", "stages", "update", "head") if args.part == "all" else (args.part,)
    print(json.dumps(profile(args.batch, parts=parts), indent=1))


if __name__ == "__main__":
    main()
