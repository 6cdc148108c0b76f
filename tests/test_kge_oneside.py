"""The folded one-side scoring path is exactly the generic score.

``score_one_side`` rewrites K-negatives-per-row scoring so the positive's
fixed entity + relation fold into one per-row base vector (~3x less
gather/scatter traffic — the TPU analogue of the reference's
head_batch/tail_batch ``_calc`` modes, ``OpenKE/openke/module/model/*.py``).
The fold must be numerically equivalent to building the full (h, t, r) index
grids and calling ``score`` — for every specialized model, both corruption
sides, with and without score-time normalization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skghoi_tpu.kge.models import (
    ComplEx,
    DistMult,
    KGEModel,
    RotatE,
    TransD,
    TransE,
    TransH,
    TransR,
)

E, R, B, K, DIM = 40, 7, 12, 9, 16


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(0, E, B), jnp.int32),
        jnp.asarray(rng.integers(0, E, B), jnp.int32),
        jnp.asarray(rng.integers(0, R, B), jnp.int32),
        jnp.asarray(rng.integers(0, E, (B, K)), jnp.int32),
        jnp.asarray(rng.integers(0, 2, B).astype(bool)),
    )


def _generic(model, params, pos_h, pos_t, pos_r, neg_ent, ct):
    return KGEModel.score_one_side.__get__(
        model.bind(params)
    )(pos_h, pos_t, pos_r, neg_ent, ct)


MODELS = [
    TransE(ent_tot=E, rel_tot=R, dim=DIM, p_norm=1, norm_flag=True),
    TransE(ent_tot=E, rel_tot=R, dim=DIM, p_norm=2, norm_flag=False),
    TransE(ent_tot=E, rel_tot=R, dim=DIM, p_norm=1, norm_flag=False, margin=6.0),
    TransH(ent_tot=E, rel_tot=R, dim=DIM, p_norm=1, norm_flag=True),
    TransH(ent_tot=E, rel_tot=R, dim=DIM, p_norm=2, norm_flag=False),
    TransD(ent_tot=E, rel_tot=R, dim_e=DIM, dim_r=DIM, p_norm=1, norm_flag=True),
    TransD(ent_tot=E, rel_tot=R, dim_e=DIM, dim_r=12, p_norm=1, norm_flag=False),
    TransR(ent_tot=E, rel_tot=R, dim_e=DIM, dim_r=DIM, p_norm=1, norm_flag=True),
    TransR(ent_tot=E, rel_tot=R, dim_e=DIM, dim_r=12, p_norm=1, norm_flag=True, margin=4.0),
    DistMult(ent_tot=E, rel_tot=R, dim=DIM),
    ComplEx(ent_tot=E, rel_tot=R, dim=DIM),
    RotatE(ent_tot=E, rel_tot=R, dim=DIM, margin=6.0),
]


@pytest.mark.parametrize("model", MODELS, ids=lambda m: type(m).__name__ + repr(
    (getattr(m, "p_norm", 0), getattr(m, "norm_flag", None), getattr(m, "margin", None))
))
def test_score_one_side_matches_generic(model):
    pos_h, pos_t, pos_r, neg_ent, ct = _batch()
    params = model.init(jax.random.PRNGKey(1), pos_h, pos_t, pos_r)
    fast = model.apply(params, pos_h, pos_t, pos_r, neg_ent, ct, method="score_one_side")
    slow = _generic(model, params, pos_h, pos_t, pos_r, neg_ent, ct)
    assert fast.shape == (B, K)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("side", [True, False])
def test_one_side_equals_plain_score_rows(side):
    """Spot-check against score() on explicitly constructed corrupted triples."""
    model = RotatE(ent_tot=E, rel_tot=R, dim=DIM, margin=6.0)
    pos_h, pos_t, pos_r, neg_ent, _ = _batch(seed=3)
    ct = jnp.full((B,), side)
    params = model.init(jax.random.PRNGKey(2), pos_h, pos_t, pos_r)
    fast = model.apply(params, pos_h, pos_t, pos_r, neg_ent, ct, method="score_one_side")
    nh = jnp.where(ct[:, None], pos_h[:, None], neg_ent)
    nt = jnp.where(ct[:, None], neg_ent, pos_t[:, None])
    nr = jnp.broadcast_to(pos_r[:, None], neg_ent.shape)
    want = model.apply(params, nh, nt, nr)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_sample_batch_oneside_filters_and_shapes():
    from skghoi_tpu.kge.data import KGData
    from skghoi_tpu.kge.sampling import DeviceKG, sample_batch_oneside

    rng = np.random.default_rng(0)
    n = 400
    triples = np.stack(
        [rng.integers(0, E, n), rng.integers(0, E, n), rng.integers(0, R, n)], 1
    )
    triples = np.unique(triples, axis=0)
    data = KGData.build(E, R, triples.astype(np.int64))
    kg = DeviceKG.from_kgdata(data)
    batch = jax.jit(
        lambda k: sample_batch_oneside(k, kg, 64, 8, bern=True, filtered=True)
    )(jax.random.PRNGKey(0))
    assert batch.neg_ent.shape == (64, 8) and batch.corrupt_tail.shape == (64,)
    # Every positive must be a real train triple.
    keyset = {tuple(row) for row in triples}
    for h, t, r in zip(
        np.asarray(batch.pos_h), np.asarray(batch.pos_t), np.asarray(batch.pos_r)
    ):
        assert (h, t, r) in keyset
    # Filtered negatives: the corrupted triple must (almost surely) be unknown.
    nh = np.where(np.asarray(batch.corrupt_tail)[:, None], np.asarray(batch.pos_h)[:, None], np.asarray(batch.neg_ent))
    nt = np.where(np.asarray(batch.corrupt_tail)[:, None], np.asarray(batch.neg_ent), np.asarray(batch.pos_t)[:, None])
    nr = np.broadcast_to(np.asarray(batch.pos_r)[:, None], nh.shape)
    known = sum(
        (h, t, r) in keyset for h, t, r in zip(nh.ravel(), nt.ravel(), nr.ravel())
    )
    # 4 rejection rounds at density n/(E*E*R) ~ 0.03: leaks ~ (0.03)^4 ~ 1e-6
    assert known == 0


def test_segment_gather_gradients_match_take():
    """_segment_gather's one-hot-matmul adjoint == jnp.take's scatter adjoint,
    with heavily duplicated indices (the case it exists for)."""
    from skghoi_tpu.kge.models import _segment_gather

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((7, 5)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 7, 40), jnp.int32)
    g = jnp.asarray(rng.standard_normal((40, 5)), jnp.float32)

    def loss_fast(t):
        return jnp.sum(_segment_gather(t, idx) * g)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * g)

    gf = jax.grad(loss_fast)(table)
    gr = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(_segment_gather(table, idx)), np.asarray(jnp.take(table, idx, axis=0))
    )


def test_transr_oneside_trains_on_tiny_kg():
    """End-to-end: the TransR oneside step (segment-gather VJP included)
    decreases margin loss under SGD."""
    import optax

    from skghoi_tpu.kge.losses import MarginLoss
    from skghoi_tpu.kge.strategy import NegativeSampling
    from skghoi_tpu.kge.sampling import CorruptBatch

    model = TransR(ent_tot=E, rel_tot=R, dim_e=DIM, dim_r=DIM, p_norm=1, norm_flag=True)
    rng = np.random.default_rng(1)
    pos_h, pos_t, pos_r, neg_ent, ct = _batch(seed=2)
    batch = CorruptBatch(pos_h, pos_t, pos_r, neg_ent, ct)
    params = model.init(jax.random.PRNGKey(0), pos_h, pos_t, pos_r)
    strategy = NegativeSampling(loss=MarginLoss(margin=4.0))
    tx = optax.sgd(0.5)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(lambda pp: strategy(model, pp, batch))(p)
        u, s = tx.update(grads, s, p)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(30):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])
