"""Benchmark: end-to-end HOI inference throughput on one TPU chip.

Runs the flagship SCG network (ResNet50+FPN backbone, device-side detection
filtering, graph head, 117-verb pair classification) at the reference's full
input resolution (canvas 832x1344, the min-800/max-1333 transform envelope)
in bfloat16 compute and measures steady-state images/second.

Measurement method: ``n`` forward passes execute as one serial device-side
``fori_loop`` chain (each iteration's input depends on the previous output),
closed by a single scalar fetch to host.  This is immune to async-dispatch
pipelining artifacts and amortizes the host<->device round trip, so the
number reflects true device throughput.

``vs_baseline``: BASELINE.json targets ">= 5x the PyTorch-CPU baseline".
That baseline is measured honestly on this machine by
``skghoi_tpu.tools.bench_torch_baseline`` — the oracle twin (the reference's
exact stage-2 math in plain torch, proven score-equal in
tests/test_reference_parity.py) on the same 832x1344 canvas — and cached in
``BASELINE_TORCH.json``.  Fallback when that file is absent: the reference's
closest published GPU figure, DETR-R50 at 27.8 img/s for stage 1 alone
(hicodet/detections/README.md:18).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time


def measure(batch_size: int = 8, canvas=(832, 1344), iters: int = 10,
            repeats: int = 3, scan_blocks: bool = True) -> dict:
    """Returns {"median": img/s, "min": ..., "max": ...} over ``repeats``
    independent chained measurements (round-2 lesson: the shared tunnel
    drifts several percent between sessions; a single measurement lost 15%
    of a real improvement to noise, so the scoreboard number is a median
    with the spread recorded alongside)."""
    import statistics

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch, _verb_mask
    from skghoi_tpu.models import SpatiallyConditionedGraph

    model = SpatiallyConditionedGraph(dtype=jnp.bfloat16, scan_blocks=scan_blocks)
    batch = _make_batch(batch_size, canvas)
    ovm = _verb_mask()
    variables = jax.jit(lambda r, b: model.init(r, b, ovm, training=False))(
        jax.random.PRNGKey(0), batch
    )  # jitted: one compiled program, not minutes of op-by-op dispatch

    @jax.jit
    def chain(variables, batch, n):
        def body(i, carry):
            b = batch._replace(images=batch.images + carry * 1e-12)
            out = model.apply(variables, b, ovm, training=False).scores
            return jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(variables, batch, 1))  # compile + warmup, synced by fetch
    samples = []
    for _ in range(repeats):
        t1 = time.perf_counter()
        float(chain(variables, batch, 1))
        t_one = time.perf_counter() - t1
        t0 = time.perf_counter()
        float(chain(variables, batch, iters + 1))
        t_many = time.perf_counter() - t0
        # Subtract the single-iteration run (which carries the constant host
        # round-trip) to isolate per-iteration device time.
        per_iter = (t_many - t_one) / iters
        samples.append(batch_size / per_iter)
    return {
        "median": statistics.median(samples),
        "min": min(samples),
        "max": max(samples),
    }


def measure_stage1(batch_size: int = 8, canvas=(832, 1344), iters: int = 10,
                   repeats: int = 3) -> dict:
    """Stage-1 (DETR-R50) inference throughput — the reference's only
    published speed numbers are detector inference
    (``hicodet/detections/README.md:18``: DETR-R50 0.036 s/img = 27.8 img/s
    on GPU), so this is the direct apples-to-apples comparison.  Weights are
    random (no checkpoint on this box) — identical FLOPs/memory traffic, so
    throughput is unaffected.  Same chained-``fori_loop`` method as
    :func:`measure`."""
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from skghoi_tpu.detect.detr import DETR

    rng = np.random.default_rng(0)
    h, w = canvas
    images = jnp.asarray(rng.uniform(-1, 1, (batch_size, h, w, 3)), jnp.float32)
    sizes = jnp.asarray(np.tile([[h, w]], (batch_size, 1)), jnp.float32)
    model = DETR(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, sizes)

    @jax.jit
    def chain(variables, images, n):
        def body(i, carry):
            out = model.apply(variables, images + carry * 1e-12, sizes)
            return jnp.sum(out.scores).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(variables, images, 1))  # compile + warmup
    samples = []
    for _ in range(repeats):
        t1 = time.perf_counter()
        float(chain(variables, images, 1))
        t_one = time.perf_counter() - t1
        t0 = time.perf_counter()
        float(chain(variables, images, iters + 1))
        per_iter = (time.perf_counter() - t0 - t_one) / iters
        samples.append(batch_size / per_iter)
    return {
        "median": statistics.median(samples),
        "min": min(samples),
        "max": max(samples),
    }


def measure_train(batch_size: int = 8, canvas=(832, 1344), iters: int = 6,
                  remat_stages: int | None = None, scan_blocks: bool = True) -> float:
    """Steady-state training images/second (fwd + bwd + AdamW) on one chip.

    ``remat_stages`` (or env ``SKGHOI_BENCH_REMAT``) rematerializes backbone
    bottlenecks from that 1-based stage on — the knob that keeps large
    batches inside HBM for the batch-size axis of the MFU sweep.
    """
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _make_batch, _verb_mask
    from skghoi_tpu.models import SpatiallyConditionedGraph
    from skghoi_tpu.parallel.train_step import build_train_step

    if remat_stages is None:
        remat_stages = int(os.environ.get("SKGHOI_BENCH_REMAT", "0"))
    model = SpatiallyConditionedGraph(dtype=jnp.bfloat16, remat_stages=remat_stages,
                                      scan_blocks=scan_blocks)
    batch = _make_batch(batch_size, canvas, with_targets=True)
    ovm = _verb_mask()
    variables = jax.jit(lambda r, b: model.init(r, b, ovm, training=True))(
        jax.random.PRNGKey(0), batch
    )
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)
    step = build_train_step(model, tx, ovm)
    rng = jax.random.PRNGKey(1)

    params, opt_state, total, losses, _ = step(params, extra, opt_state, batch, rng)  # compile
    jax.block_until_ready(losses)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, total, losses, _ = step(params, extra, opt_state, batch, rng)
        jax.block_until_ready(losses)
        samples.append(batch_size / ((time.perf_counter() - t0) / iters))
    return sorted(samples)[1]  # median of 3


def main():
    import os
    import sys

    # Fail fast if the tunneled chip is unreachable.  This must happen
    # BEFORE the first jax import/backend touch: with the relay port down,
    # axon's PJRT init blocks indefinitely (measured), so a dead tunnel
    # would otherwise read as a silent hang rather than a clear error.
    if os.environ.get("JAX_PLATFORMS", "") == "axon" and "--allow-cpu" not in sys.argv:
        import socket

        host = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0]
        port = int(os.environ.get("SKGHOI_AXON_RELAY_PORT", "8103"))
        try:
            socket.create_connection((host, port), timeout=5).close()
        except OSError as e:
            print(f"bench.py: TPU relay {host}:{port} unreachable ({e}) — "
                  "refusing to start (backend init would hang); pass "
                  "--allow-cpu to bench on host CPU instead", file=sys.stderr)
            sys.exit(2)

    # Driver gate: pause registered builder background jobs for the duration
    # (round-4 lesson: hedge jobs starved a gate's XLA compile past timeout).
    import contextlib

    from skghoi_tpu.utils.gate_guard import gate_window

    ctx = contextlib.ExitStack()
    ctx.enter_context(gate_window(lease_seconds=1800))
    import atexit

    atexit.register(ctx.close)

    if "--stage1" in sys.argv:
        stats = measure_stage1()
        print(
            json.dumps(
                {
                    "metric": "detr_r50_inference_images_per_sec",
                    "value": round(stats["median"], 2),
                    "unit": "img/s (832x1344, bf16, batch 8, single chip; "
                            "median of 3 chained runs)",
                    # The reference's own published figure for this exact
                    # model: 0.036 s/img (hicodet/detections/README.md:18).
                    "vs_baseline": round(stats["median"] / 27.8, 3),
                    "spread": {"min": round(stats["min"], 2),
                               "max": round(stats["max"], 2)},
                }
            )
        )
        return

    if "--train" in sys.argv:
        images_per_sec = measure_train()
        print(
            json.dumps(
                {
                    "metric": "hoi_train_images_per_sec",
                    "value": round(images_per_sec, 2),
                    "unit": "img/s (832x1344, bf16, single chip, fwd+bwd+adamw)",
                    "vs_baseline": None,
                }
            )
        )
        return

    # Pin the workload geometry: an env knob must never silently change what
    # the scoreboard number measures (it is recorded in the output instead).
    batch_size = int(os.environ.get("SKGHOI_BENCH_BATCH", "8"))
    tall_frac = float(os.environ.get("SKGHOI_BENCH_TALL_FRAC", "0.1"))
    stats = measure(batch_size=batch_size)
    images_per_sec = stats["median"]
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_TORCH.json")
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            b = json.load(f)
        # The torch-CPU twin ratio is only comparable at the geometry the
        # baseline was measured at (canvas 832x1344, scoreboard batch 8);
        # SKGHOI_BENCH_BATCH must not silently inflate the ratio against a
        # baseline measured elsewhere.
        if list(b.get("canvas", [])) == [832, 1344] and batch_size == b.get("batch", 8):
            baseline = float(b["value"])  # measured torch-CPU twin
    # The defensible cross-hardware yardstick: the reference's closest
    # published GPU figure, DETR-R50 stage 1 alone at 27.8 img/s
    # (hicodet/detections/README.md:18).  Emitted alongside so driver
    # artifacts record the meaningful comparison, not just the 1000x
    # single-thread-CPU optic.
    DETR_R50_GPU = 27.8
    print(
        json.dumps(
            {
                "metric": "hoi_inference_images_per_sec",
                "value": round(images_per_sec, 2),
                "unit": f"img/s (832x1344, bf16, batch {batch_size}, single chip; "
                        "median of 3 chained runs)",
                "vs_baseline": round(images_per_sec / baseline, 3) if baseline else None,
                "vs_detr_r50_gpu": round(images_per_sec / DETR_R50_GPU, 3),
                "spread": {"min": round(stats["min"], 2), "max": round(stats["max"], 2)},
                "config": {"batch": batch_size, "canvas": [832, 1344],
                           "tall_frac": tall_frac},
            }
        )
    )


if __name__ == "__main__":
    main()
