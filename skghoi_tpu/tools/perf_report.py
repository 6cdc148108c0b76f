"""Measured performance report: throughput, step time, FLOPs, and MFU.

The reference repo never measures utilization (SURVEY.md §5 — wall-clock
only); this tool is the TPU-native replacement the round-1 verdict asked
for: it times the flagship SCG network's inference and training steps on
the attached chip, pulls the compiled HLO FLOP count from XLA's
``cost_analysis``, and reports model FLOPs utilization against the chip's
bf16 peak.

    python -m skghoi_tpu.tools.perf_report [--batch 8] [--train] [--trace DIR]

Prints one JSON document.  ``--trace`` additionally captures a
``jax.profiler`` trace of a few steady-state steps for TensorBoard/XProf.
"""

from __future__ import annotations

import argparse
import json
import time

# Peak dense bf16 matmul throughput per chip, in FLOP/s.  Sources: public
# TPU spec sheets (v4: 275e12, v5e: 394e12, v5p: 459e12, v6e: 918e12).
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 394e12,
    "TPU v5e": 394e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return 394e12  # default to v5e if unrecognized


def _timed(fn, args, iters=10):
    """Steady-state seconds per call (post-compile, sync via block)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(batch_size: int = 8, canvas=(832, 1344), include_train: bool = True,
           trace_dir: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _make_batch, _verb_mask
    from skghoi_tpu.models import SpatiallyConditionedGraph
    from skghoi_tpu.parallel.train_step import build_train_step

    dev = jax.devices()[0]
    peak = _peak_for(dev)
    out: dict = {
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "peak_bf16_flops": peak,
        "batch_size": batch_size,
        "canvas": list(canvas),
    }

    model = SpatiallyConditionedGraph(dtype=jnp.bfloat16)
    ovm = _verb_mask()
    batch = _make_batch(batch_size, canvas)
    variables = jax.jit(lambda r, b: model.init(r, b, ovm, training=False))(
        jax.random.PRNGKey(0), batch
    )

    fwd = jax.jit(lambda v, b: model.apply(v, b, ovm, training=False).scores)
    _c0 = time.perf_counter()
    compiled = fwd.lower(variables, batch).compile()  # one compile, reused for timing
    compile_infer_s = time.perf_counter() - _c0
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    infer_flops = float(cost.get("flops", 0.0))
    t_infer = _timed(compiled, (variables, batch))
    out["inference"] = {
        "seconds_per_step": t_infer,
        "images_per_sec": batch_size / t_infer,
        "tflops_per_step": infer_flops / 1e12,
        "mfu": infer_flops / t_infer / peak,
        # Time-to-first-step matters operationally (driver gates, test
        # sessions): the XLA compile of this exact program on this host.
        "compile_seconds": round(compile_infer_s, 1),
    }

    if include_train:
        train_batch = _make_batch(batch_size, canvas, with_targets=True)
        tx = optax.adamw(1e-4)
        step = build_train_step(model, tx, ovm)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        opt_state = jax.jit(tx.init)(params)
        rng = jax.random.PRNGKey(1)
        _c1 = time.perf_counter()
        compiled_t = step.lower(params, extra, opt_state, train_batch, rng).compile()
        compile_train_s = time.perf_counter() - _c1
        cost_t = compiled_t.cost_analysis()
        cost_t = cost_t[0] if isinstance(cost_t, list) else cost_t
        train_flops = float(cost_t.get("flops", 0.0))
        # The step donates params/opt_state, so thread the returned state
        # through the timing loop instead of replaying stale buffers.
        params, opt_state, _, losses, _ = compiled_t(params, extra, opt_state, train_batch, rng)
        jax.block_until_ready(losses)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, _, losses, _ = compiled_t(params, extra, opt_state, train_batch, rng)
        jax.block_until_ready(losses)
        t_train = (time.perf_counter() - t0) / iters
        out["train"] = {
            "seconds_per_step": t_train,
            "images_per_sec": batch_size / t_train,
            "tflops_per_step": train_flops / 1e12,
            "mfu": train_flops / t_train / peak,
            "compile_seconds": round(compile_train_s, 1),
        }

    if trace_dir:
        from skghoi_tpu.utils.profiling import trace

        with trace(trace_dir):
            for _ in range(3):
                jax.block_until_ready(compiled(variables, batch))
            if include_train:
                jax.block_until_ready(
                    compiled_t(params, extra, opt_state, train_batch, rng)
                )
        out["trace_dir"] = trace_dir
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--no-train", action="store_true")
    p.add_argument("--trace", default=None, help="capture a jax.profiler trace here")
    args = p.parse_args(argv)
    print(json.dumps(report(args.batch, include_train=not args.no_train,
                            trace_dir=args.trace), indent=1))


if __name__ == "__main__":
    main()
