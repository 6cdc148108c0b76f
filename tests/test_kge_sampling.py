"""Samplers: filtered corruption must never emit known train triples."""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu.kge.data import KGData
from skghoi_tpu.kge.sampling import (
    DeviceKG,
    NumpySampler,
    TripleHashSet,
    lex3_contains,
    sample_batch,
)


def make_kg(seed=0, n_ent=40, n_rel=5, n_triples=200):
    rng = np.random.default_rng(seed)
    triples = np.stack(
        [
            rng.integers(0, n_ent, n_triples),
            rng.integers(0, n_ent, n_triples),
            rng.integers(0, n_rel, n_triples),
        ],
        axis=1,
    )
    return KGData.build(n_ent, n_rel, triples)


def test_dedup_matches_reference_reader():
    triples = np.asarray([[0, 1, 0], [0, 1, 0], [2, 3, 1]])
    data = KGData.build(5, 2, triples)
    assert data.train_total == 2


def test_lex3_contains():
    data = make_kg()
    h, t, r = data.train[:, 0], data.train[:, 1], data.train[:, 2]
    order = np.lexsort((t, r, h))
    sh, sr, st = (jnp.asarray(x[order], jnp.int32) for x in (h, r, t))
    train_set = {tuple(x) for x in data.train}
    rng = np.random.default_rng(1)
    qh = rng.integers(0, data.ent_tot, 500)
    qt = rng.integers(0, data.ent_tot, 500)
    qr = rng.integers(0, data.rel_tot, 500)
    got = np.asarray(
        lex3_contains(
            sh, sr, st,
            jnp.asarray(qh, jnp.int32), jnp.asarray(qr, jnp.int32), jnp.asarray(qt, jnp.int32),
        )
    )
    want = np.asarray([(hh, tt, rr) in train_set for hh, tt, rr in zip(qh, qt, qr)])
    assert (got == want).all()


def test_triple_hashset_matches_exact_membership():
    data = make_kg(n_ent=25, n_triples=300)
    hs = TripleHashSet(data.train[:, 0], data.train[:, 2], data.train[:, 1])
    train_set = {tuple(x) for x in data.train}
    # no false negatives on members
    got = np.asarray(
        hs.contains(
            jnp.asarray(data.train[:, 0], jnp.int32),
            jnp.asarray(data.train[:, 2], jnp.int32),
            jnp.asarray(data.train[:, 1], jnp.int32),
        )
    )
    assert got.all()
    # non-members: exact agreement expected at these sizes (fp rate ~2^-31)
    rng = np.random.default_rng(2)
    qh = rng.integers(0, data.ent_tot, 2000)
    qt = rng.integers(0, data.ent_tot, 2000)
    qr = rng.integers(0, data.rel_tot, 2000)
    got = np.asarray(hs.contains(jnp.asarray(qh, jnp.int32), jnp.asarray(qr, jnp.int32), jnp.asarray(qt, jnp.int32)))
    want = np.asarray([(hh, tt, rr) in train_set for hh, tt, rr in zip(qh, qt, qr)])
    assert (got == want).all()


def test_jax_sampler_filtered_negatives():
    data = make_kg()
    kg = DeviceKG.from_kgdata(data)
    batch = sample_batch(jax.random.PRNGKey(0), kg, batch_size=64, neg_rate=8, bern=True)
    train_set = {tuple(x) for x in data.train}
    # positives are train triples
    for h, t, r in zip(np.asarray(batch.pos_h), np.asarray(batch.pos_t), np.asarray(batch.pos_r)):
        assert (h, t, r) in train_set
    # negatives: corrupt exactly one side, and (near-certainly) unknown
    nh, nt, nr = map(np.asarray, (batch.neg_h, batch.neg_t, batch.neg_r))
    ph, pt = np.asarray(batch.pos_h), np.asarray(batch.pos_t)
    known = sum((h, t, r) in train_set for h, t, r in zip(nh.ravel(), nt.ravel(), nr.ravel()))
    assert known == 0  # 4 rejection rounds on a sparse graph -> none expected
    same_h = nh == ph[:, None]
    same_t = nt == pt[:, None]
    assert bool(np.all(same_h | same_t))  # only one side corrupted


def test_numpy_sampler_exact_filtering():
    data = make_kg(n_ent=15, n_triples=150)  # dense graph stresses the filter
    sampler = NumpySampler(data, seed=3)
    train_set = {tuple(x) for x in data.train}
    batch = sampler.sample(batch_size=128, neg_rate=4, bern=True)
    for h, t, r in zip(batch.neg_h.ravel(), batch.neg_t.ravel(), batch.neg_r.ravel()):
        assert (h, t, r) not in train_set


def test_numpy_corrupt_excludes_exact_known_set():
    data = make_kg(n_ent=10, n_triples=60)
    sampler = NumpySampler(data, seed=0)
    h, r = int(data.train[0, 0]), int(data.train[0, 2])
    known = {int(t) for hh, t, rr in data.train if hh == h and rr == r}
    draws = sampler._corrupt(sampler._ht_keys, sampler._ht_tails, h * data.rel_tot + r, 2000)
    assert set(draws.tolist()) & known == set()
    # and over many draws we cover the full complement
    assert set(draws.tolist()) == set(range(data.ent_tot)) - known


def test_bern_tail_prob_range():
    data = make_kg()
    p = data.bern_tail_prob()
    assert ((p >= 0) & (p <= 1)).all()
