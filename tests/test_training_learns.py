"""The full three-loss training step actually LEARNS, not merely runs.

Overfit check on one tiny synthetic batch: repeated steps on the same
images/GT must drive the summed loss down substantially and the HOI focal
term specifically (the reference's engine trains exactly this objective,
``utils.py:213-229``).  Complements the gradient-flow tests with evidence
that the optimizer/labels/prior plumbing points downhill.
"""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu.data import HOIBatch, HOITargets
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.parallel.train_step import build_train_step
from skghoi_tpu.train.optimizer import build_optimizer


def _batch(rng, B=2, M=8, G=2, canvas=(64, 96)):
    def boxes(n):
        xy = rng.uniform(0, 30, (B, n, 2))
        wh = rng.uniform(10, 28, (B, n, 2))
        return jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    det = boxes(M)
    labels = jnp.asarray(rng.integers(0, 80, (B, M))).at[:, :3].set(49)
    # GT pairs sit exactly on detection boxes so association fires.
    tb_h = det[:, :G]
    tb_o = det[:, 3 : 3 + G]
    return HOIBatch(
        images=jnp.asarray(rng.uniform(0, 1, (B, *canvas, 3)), jnp.float32),
        image_sizes=jnp.asarray(np.tile([list(canvas)], (B, 1)), jnp.float32),
        original_sizes=jnp.asarray(np.tile([list(canvas)], (B, 1)), jnp.float32),
        det_boxes=det,
        det_labels=labels,
        det_scores=jnp.asarray(rng.uniform(0.5, 1, (B, M)), jnp.float32),
        det_valid=jnp.ones((B, M), bool),
        targets=HOITargets(
            tb_h, tb_o,
            jnp.asarray(np.asarray(labels[:, 3 : 3 + G])),
            jnp.asarray(rng.integers(0, 117, (B, G))),
            jnp.ones((B, G), bool),
        ),
    )


def test_train_steps_reduce_losses():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    ovm = jnp.ones((80, 117), jnp.float32)
    model = SpatiallyConditionedGraph()
    variables = dict(model.init(jax.random.PRNGKey(0), batch, ovm, training=True,
                                rng=jax.random.PRNGKey(1)))
    params = variables.pop("params")
    tx = build_optimizer(params, learning_rate=3e-3, steps_per_epoch=1000)
    opt_state = tx.init(params)
    step = build_train_step(model, tx, ovm)

    totals, hoi = [], []
    for i in range(12):
        params, opt_state, total, losses, _ = step(
            params, variables, opt_state, batch, jax.random.PRNGKey(100 + i)
        )
        totals.append(float(total))
        hoi.append(float(losses["hoi_loss"]))

    assert np.isfinite(totals).all()
    assert totals[-1] < 0.7 * totals[0], (totals[0], totals[-1])
    assert hoi[-1] < 0.8 * hoi[0], (hoi[0], hoi[-1])
