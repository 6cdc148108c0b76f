"""Full SCG network: forward/backward smoke on a tiny canvas, both modes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skghoi_tpu.data import HOIBatch, HOITargets
from skghoi_tpu.models import SpatiallyConditionedGraph

B, M, G = 2, 16, 4
CANVAS = (64, 64)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, *CANVAS, 3)), jnp.float32)
    sizes = jnp.asarray([[64, 60], [56, 64]], jnp.float32)

    def boxes(n):
        xy = rng.uniform(0, 30, (B, n, 2))
        wh = rng.uniform(5, 25, (B, n, 2))
        return jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    det_labels = jnp.asarray(rng.integers(0, 80, (B, M))).at[:, :5].set(49)
    targets = HOITargets(
        boxes_h=boxes(G),
        boxes_o=boxes(G),
        object=jnp.asarray(rng.integers(0, 80, (B, G))),
        labels=jnp.asarray(rng.integers(0, 117, (B, G))),
        valid=jnp.asarray([[True, True, False, False], [True] * 4]),
    )
    batch = HOIBatch(
        images,
        sizes,
        sizes,
        boxes(M),
        det_labels,
        jnp.asarray(rng.uniform(0.1, 1.0, (B, M)), jnp.float32),
        jnp.ones((B, M), bool),
        targets,
    )
    ovm = jnp.asarray(rng.uniform(size=(80, 117)) < 0.3, jnp.float32)
    model = SpatiallyConditionedGraph()
    params = model.init(jax.random.PRNGKey(0), batch, ovm, training=True, rng=jax.random.PRNGKey(1))
    return model, params, batch, ovm


def test_training_forward_losses_finite(setup):
    model, params, batch, ovm = setup
    out = model.apply(params, batch, ovm, training=True, rng=jax.random.PRNGKey(1))
    assert out.scores.shape == (B, 15, 30, 117)
    assert set(out.losses) == {"hoi_loss", "interactiveness_loss", "transh_loss"}
    for k, v in out.losses.items():
        assert bool(jnp.isfinite(v)), k
    # final scores are zero outside valid-verb prior entries
    assert bool(jnp.all((out.scores > 0) <= (out.prior[:, 0] > 0)))


def test_eval_forward_no_losses(setup):
    model, params, batch, ovm = setup
    out = model.apply(params, batch._replace(targets=None), ovm, training=False)
    assert out.losses is None and out.labels is None
    assert bool(jnp.all(jnp.isfinite(out.scores)))
    assert bool(jnp.all((out.scores >= 0) & (out.scores <= 1)))


def test_gradients_flow_including_transh(setup):
    model, params, batch, ovm = setup

    def loss_fn(p):
        o = model.apply(p, batch, ovm, training=True, rng=jax.random.PRNGKey(1))
        return sum(o.losses.values())

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # TransH embeddings must receive gradient (the reference recreated the
    # module every forward so they never trained — SURVEY.md §2.5-1).
    te = g["params"]["interaction_head"]["box_pair_head"]["transh"]["ent_embeddings"]["embedding"]
    assert float(jnp.sum(jnp.abs(te))) > 0


def test_empty_detections_image_is_safe(setup):
    model, params, batch, ovm = setup
    batch2 = batch._replace(det_valid=jnp.zeros_like(batch.det_valid), targets=None)
    out = model.apply(params, batch2, ovm, training=False)
    assert int(out.n[0]) == 0
    assert bool(jnp.all(out.scores == 0))
    assert bool(jnp.all(jnp.isfinite(out.scores)))
