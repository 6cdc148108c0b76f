"""Sharded training step on the virtual 8-device mesh (in-suite dryrun twin)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skghoi_tpu.data import HOIBatch, HOITargets
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from skghoi_tpu.parallel.train_step import build_train_step
from skghoi_tpu.train.optimizer import build_optimizer


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")
def test_sharded_train_step_runs_and_matches_single_device():
    rng = np.random.default_rng(0)
    B, M, G = 8, 12, 2
    canvas = (64, 96)

    def boxes(n):
        xy = rng.uniform(0, 30, (B, n, 2))
        wh = rng.uniform(8, 25, (B, n, 2))
        return jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    batch = HOIBatch(
        images=jnp.asarray(rng.uniform(0, 1, (B, *canvas, 3)), jnp.float32),
        image_sizes=jnp.asarray(np.tile([[64, 96]], (B, 1)), jnp.float32),
        original_sizes=jnp.asarray(np.tile([[64, 96]], (B, 1)), jnp.float32),
        det_boxes=boxes(M),
        det_labels=jnp.asarray(rng.integers(0, 80, (B, M))).at[:, :4].set(49),
        det_scores=jnp.asarray(rng.uniform(0.3, 1, (B, M)), jnp.float32),
        det_valid=jnp.ones((B, M), bool),
        targets=HOITargets(
            boxes(G), boxes(G),
            jnp.asarray(rng.integers(0, 80, (B, G))),
            jnp.asarray(rng.integers(0, 117, (B, G))),
            jnp.ones((B, G), bool),
        ),
    )
    ovm = jnp.asarray(rng.uniform(size=(80, 117)) < 0.3, jnp.float32)
    model = SpatiallyConditionedGraph()
    variables = dict(
        model.init(jax.random.PRNGKey(0), batch, ovm, training=True, rng=jax.random.PRNGKey(1))
    )
    params = variables.pop("params")
    tx = build_optimizer(params, steps_per_epoch=10)
    opt_state = tx.init(params)
    # donate=False: this A/B calls the step twice with pytrees that may
    # alias (replicate() can reuse the source buffer for one shard), so the
    # production donation would invalidate the reference inputs.  The
    # donating path is covered by test_nan_guard / test_training_learns.
    step = build_train_step(model, tx, ovm, donate=False)

    # Single-device reference.
    _, _, total_ref, losses_ref, _ = step(
        params, variables, opt_state, batch, jax.random.PRNGKey(2)
    )

    # Sharded over the mesh: same global math, XLA inserts the collectives.
    mesh = make_mesh()
    p_sh = replicate(params, mesh)
    v_sh = replicate(variables, mesh)
    o_sh = replicate(opt_state, mesh)
    b_sh = shard_batch(batch, mesh)
    p2, o2, total_sh, losses_sh, _ = step(p_sh, v_sh, o_sh, b_sh, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=2e-4)
    for k in losses_ref:
        np.testing.assert_allclose(float(losses_sh[k]), float(losses_ref[k]), rtol=2e-4)
    # Updated parameters remain replicated and finite.
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))
