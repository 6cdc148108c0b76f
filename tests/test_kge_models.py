"""KGE model scoring vs manual numpy formulas on hand-set parameters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skghoi_tpu.kge import (
    Analogy,
    ComplEx,
    DistMult,
    HolE,
    RESCAL,
    RotatE,
    SimplE,
    TransD,
    TransE,
    TransH,
    TransR,
)

E, R, D = 7, 3, 8
KEY = jax.random.PRNGKey(0)
H = jnp.asarray([0, 2])
T = jnp.asarray([1, 3])
REL = jnp.asarray([0, 2])


def init(model):
    return model.init(KEY, H, T, REL)


def l2n(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_transe_matches_numpy():
    m = TransE(ent_tot=E, rel_tot=R, dim=D, p_norm=1, norm_flag=True)
    params = init(m)
    ent = np.asarray(params["params"]["ent_embeddings"]["embedding"])
    rel = np.asarray(params["params"]["rel_embeddings"]["embedding"])
    want = np.abs(l2n(ent[[0, 2]]) + l2n(rel[[0, 2]]) - l2n(ent[[1, 3]])).sum(-1)
    got = np.asarray(m.apply(params, H, T, REL))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # rank_scores == score for a distance model
    np.testing.assert_allclose(
        np.asarray(m.apply(params, H, T, REL, method="rank_scores")), got, rtol=1e-6
    )


def test_transh_projection_orthogonal():
    m = TransH(ent_tot=E, rel_tot=R, dim=D, p_norm=2, norm_flag=True)
    params = init(m)
    w = np.asarray(params["params"]["norm_vector"]["embedding"])[[0, 2]]
    ent = np.asarray(params["params"]["ent_embeddings"]["embedding"])
    proj = np.asarray(TransH._transfer(jnp.asarray(ent[[0, 2]]), jnp.asarray(w)))
    dots = np.sum(proj * l2n(w), -1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)
    # embeddings_and_score returns raw (untransferred) embeddings
    he, re, rn, te, score = m.apply(params, H, T, REL, method="embeddings_and_score")
    np.testing.assert_allclose(np.asarray(he), ent[[0, 2]], rtol=1e-6)
    assert score.shape == (2,)


def test_distmult_and_complex_match_numpy():
    m = DistMult(ent_tot=E, rel_tot=R, dim=D)
    params = init(m)
    ent = np.asarray(params["params"]["ent_embeddings"]["embedding"])
    rel = np.asarray(params["params"]["rel_embeddings"]["embedding"])
    want = np.sum(ent[[0, 2]] * rel[[0, 2]] * ent[[1, 3]], -1)
    got = np.asarray(m.apply(params, H, T, REL))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # similarity model: rank score is negated
    np.testing.assert_allclose(
        np.asarray(m.apply(params, H, T, REL, method="rank_scores")), -got, rtol=1e-5
    )

    c = ComplEx(ent_tot=E, rel_tot=R, dim=D)
    cp = c.init(KEY, H, T, REL)
    p = cp["params"]
    hr, hi = np.asarray(p["ent_re_embeddings"]["embedding"]), np.asarray(p["ent_im_embeddings"]["embedding"])
    rr, ri = np.asarray(p["rel_re_embeddings"]["embedding"]), np.asarray(p["rel_im_embeddings"]["embedding"])
    i, j, k = [0, 2], [1, 3], [0, 2]
    want = np.sum(
        hr[i] * hr[j] * rr[k] + hi[i] * hi[j] * rr[k] + hr[i] * hi[j] * ri[k] - hi[i] * hr[j] * ri[k],
        -1,
    )
    np.testing.assert_allclose(np.asarray(c.apply(cp, H, T, REL)), want, rtol=1e-5)


def test_transr_identity_init_reduces_to_transe_projection():
    m = TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D, p_norm=1, norm_flag=False)
    params = init(m)
    ent = np.asarray(params["params"]["ent_embeddings"]["embedding"])
    rel = np.asarray(params["params"]["rel_embeddings"]["embedding"])
    # identity transfer matrices -> plain h + r - t
    want = np.abs(ent[[0, 2]] + rel[[0, 2]] - ent[[1, 3]]).sum(-1)
    np.testing.assert_allclose(np.asarray(m.apply(params, H, T, REL)), want, rtol=1e-5)


def test_hole_ccorr_matches_direct_convolution():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 6)).astype(np.float32)
    b = rng.normal(size=(2, 6)).astype(np.float32)
    got = np.asarray(HolE._ccorr(jnp.asarray(a), jnp.asarray(b)))
    # circular correlation: c[k] = sum_i a[i] * b[(i + k) mod n]
    want = np.stack(
        [[np.sum(a[bi] * np.roll(b[bi], -k)) for k in range(6)] for bi in range(2)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_all_models_shapes_and_regularization():
    models = [
        TransE(ent_tot=E, rel_tot=R, dim=D),
        TransH(ent_tot=E, rel_tot=R, dim=D),
        TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2),
        TransD(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2),
        DistMult(ent_tot=E, rel_tot=R, dim=D),
        ComplEx(ent_tot=E, rel_tot=R, dim=D),
        RESCAL(ent_tot=E, rel_tot=R, dim=D),
        Analogy(ent_tot=E, rel_tot=R, dim=D),
        SimplE(ent_tot=E, rel_tot=R, dim=D),
        RotatE(ent_tot=E, rel_tot=R, dim=D),
        HolE(ent_tot=E, rel_tot=R, dim=D),
    ]
    hb = jnp.zeros((4, 5), jnp.int32)
    for m in models:
        params = m.init(KEY, H, T, REL)
        s = m.apply(params, H, T, REL)
        assert s.shape == (2,), type(m).__name__
        assert bool(jnp.all(jnp.isfinite(s))), type(m).__name__
        # batched leading dims work
        s2 = m.apply(params, hb, hb, jnp.zeros((4, 5), jnp.int32))
        assert s2.shape == (4, 5), type(m).__name__
        reg = m.apply(params, H, T, REL, method="regularization")
        assert reg.shape == () and bool(jnp.isfinite(reg)), type(m).__name__
        rs = m.apply(params, H, T, REL, method="rank_scores")
        assert rs.shape == (2,), type(m).__name__


def test_transr_rank_all_matches_generic_broadcast():
    m = TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2, p_norm=1, norm_flag=True)
    params = m.init(KEY, H, T, REL)
    ents = jnp.arange(E, dtype=jnp.int32)
    h, r = jnp.asarray(2, jnp.int32), jnp.asarray(1, jnp.int32)
    generic = m.apply(
        params, jnp.full((E,), h), ents, jnp.full((E,), r), method="rank_scores"
    )
    fast = m.apply(params, h, r, method="rank_all_tails")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(generic), rtol=1e-5, atol=1e-6)
    t = jnp.asarray(4, jnp.int32)
    generic_h = m.apply(
        params, ents, jnp.full((E,), t), jnp.full((E,), r), method="rank_scores"
    )
    fast_h = m.apply(params, t, r, method="rank_all_heads")
    np.testing.assert_allclose(np.asarray(fast_h), np.asarray(generic_h), rtol=1e-5, atol=1e-6)


def test_transr_rank_all_margin_mode_matches_rank_scores():
    """Advisor round-1 low: with margin set, _rank_all must stay lower-is-better
    (rank_scores contract), not return margin - dist."""
    m = TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2, p_norm=1, norm_flag=True,
               margin=4.0)
    params = m.init(KEY, H, T, REL)
    ents = jnp.arange(E, dtype=jnp.int32)
    h, r = jnp.asarray(2, jnp.int32), jnp.asarray(1, jnp.int32)
    generic = m.apply(
        params, jnp.full((E,), h), ents, jnp.full((E,), r), method="rank_scores"
    )
    fast = m.apply(params, h, r, method="rank_all_tails")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(generic), rtol=1e-5, atol=1e-6)


def test_transr_chunked_score_matches_direct():
    """score_chunk must be a pure memory optimization: identical values and
    gradients, including with padding (batch not divisible by chunk)."""
    import jax

    m_direct = TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2)
    m_chunk = TransR(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2, score_chunk=4)
    params = m_direct.init(KEY, H, T, REL)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, E, (3, 7)), jnp.int32)
    t = jnp.asarray(rng.integers(0, E, (3, 7)), jnp.int32)
    r = jnp.asarray(rng.integers(0, R, (3, 7)), jnp.int32)

    want = m_direct.apply(params, h, t, r)
    got = m_chunk.apply(params, h, t, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def loss(p, model):
        return jnp.sum(model.apply(p, h, t, r) ** 2)

    g_want = jax.grad(loss)(params, m_direct)
    g_got = jax.grad(loss)(params, m_chunk)
    for ka, kb in zip(
        jax.tree_util.tree_leaves(g_got), jax.tree_util.tree_leaves(g_want)
    ):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model", [
    TransE(ent_tot=E, rel_tot=R, dim=D, p_norm=1, norm_flag=True),
    TransE(ent_tot=E, rel_tot=R, dim=D, p_norm=2, norm_flag=False, margin=6.0),
    TransH(ent_tot=E, rel_tot=R, dim=D, p_norm=1, norm_flag=True),
    TransH(ent_tot=E, rel_tot=R, dim=D, p_norm=1, norm_flag=False, margin=6.0),
    TransD(ent_tot=E, rel_tot=R, dim_e=D, dim_r=D // 2, p_norm=1, norm_flag=True),
    DistMult(ent_tot=E, rel_tot=R, dim=D),
    ComplEx(ent_tot=E, rel_tot=R, dim=D),
    RotatE(ent_tot=E, rel_tot=R, dim=D, margin=6.0),
], ids=lambda m: type(m).__name__ + str(getattr(m, "margin", None)))
def test_rank_all_fast_paths_match_rank_scores(model):
    """The whole-table ranking fast paths (one fused broadcast-reduce or
    matvec per query; no [query, entity] gathers) must order entities exactly
    like the generic rank_scores broadcast — both sides, margin or not.
    Monotonic-consistency is what the Tester relies on: compare via argsort
    AND via values up to a per-query constant shift."""
    params = model.init(KEY, H, T, REL)
    ents = jnp.arange(E, dtype=jnp.int32)
    a, r = jnp.asarray(3, jnp.int32), jnp.asarray(1, jnp.int32)

    # tails: replace t
    generic_t = model.apply(params, jnp.full((E,), a), ents, jnp.full((E,), r),
                            method="rank_scores")
    fast_t = model.apply(params, a, r, method="rank_all_tails")
    # heads: replace h
    generic_h = model.apply(params, ents, jnp.full((E,), a), jnp.full((E,), r),
                            method="rank_scores")
    fast_h = model.apply(params, a, r, method="rank_all_heads")

    for fast, generic in ((fast_t, generic_t), (fast_h, generic_h)):
        fast, generic = np.asarray(fast, np.float64), np.asarray(generic, np.float64)
        # values equal up to one constant offset (margin shift conventions)
        delta = fast - generic
        np.testing.assert_allclose(delta, delta[0], rtol=0, atol=5e-5)
        # and therefore identical rankings
        np.testing.assert_array_equal(np.argsort(fast, kind="stable"),
                                      np.argsort(generic, kind="stable"))
