"""The C++ native backend exercised as a real behavioral oracle (VERDICT #5).

Covers the ``extern "C"`` surface against (a) the Python ``KGData`` loader,
(b) the OpenKE sampling contract (positives from train, filtered negatives
never known triples, labels +-1), and (c) the on-device Tester: identical
link-prediction metrics when both rank with the same score table.

Reference semantics: ``OpenKE/openke/base/Base.cpp:161-197`` (sampling),
``Test.h:230-325`` (link prediction).
"""

import os

import numpy as np
import pytest

from skghoi_tpu.kge.data import KGData

native = pytest.importorskip("skghoi_tpu.kge.native")


def write_benchmark(tmpdir, rng, ent_tot=40, rel_tot=4, n_train=240, n_valid=30, n_test=30):
    """Synthetic KG in OpenKE benchmark format (unique triples across splits)."""
    seen = set()
    triples = []
    while len(triples) < n_train + n_valid + n_test:
        h, t = rng.integers(0, ent_tot, 2)
        r = rng.integers(0, rel_tot)
        if h != t and (h, t, r) not in seen:
            seen.add((h, t, r))
            triples.append((int(h), int(t), int(r)))
    splits = {
        "train2id.txt": triples[:n_train],
        "valid2id.txt": triples[n_train:n_train + n_valid],
        "test2id.txt": triples[n_train + n_valid:],
    }
    for name, rows in splits.items():
        with open(os.path.join(tmpdir, name), "w") as f:
            f.write(f"{len(rows)}\n")
            for h, t, r in rows:
                f.write(f"{h} {t} {r}\n")
    with open(os.path.join(tmpdir, "entity2id.txt"), "w") as f:
        f.write(f"{ent_tot}\n")
        for i in range(ent_tot):
            f.write(f"e{i}\t{i}\n")
    with open(os.path.join(tmpdir, "relation2id.txt"), "w") as f:
        f.write(f"{rel_tot}\n")
        for i in range(rel_tot):
            f.write(f"r{i}\t{i}\n")
    return splits


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("kg"))
    rng = np.random.default_rng(0)
    splits = write_benchmark(tmpdir, rng)
    return tmpdir, splits


def test_native_import_totals_match_kgdata(bench):
    tmpdir, _ = bench
    base = native.NativeBase(in_path=tmpdir)
    base.import_test_files()
    data = KGData.load(tmpdir)
    assert base.ent_tot == data.ent_tot
    assert base.rel_tot == data.rel_tot
    assert base.train_tot == data.train_total
    assert base.test_tot == len(data.test)
    assert base.lib.getValidTotal() == len(data.valid)
    assert base.lib.getTripleTotal() == data.train_total + len(data.valid) + len(data.test)


def test_native_sampling_contract(bench):
    tmpdir, splits = bench
    train_set = {tuple(t) for t in splits["train2id.txt"]}
    base = native.NativeBase(in_path=tmpdir, bern=True)
    B, K = 60, 5
    h, t, r, y = base.sampling(batch_size=B, neg_rate=K)
    assert y[:B].min() == y[:B].max() == 1.0  # positives labelled +1
    assert set(y[B:]) == {-1.0}
    # positives are real training triples
    for i in range(B):
        assert (h[i], t[i], r[i]) in train_set
    # filtered negatives never collide with known train triples (Corrupt.h)
    for i in range(B, B * (1 + K)):
        assert (h[i], t[i], r[i]) not in train_set
    # each negative corrupts exactly one side of its positive
    for i in range(B, B * (1 + K)):
        pos = (i - B) % B  # OpenKE layout: negatives cycle over the batch
        same_h = h[i] == h[pos] and r[i] == r[pos]
        same_t = t[i] == t[pos] and r[i] == r[pos]
        assert same_h or same_t


def test_native_link_prediction_matches_tester(bench):
    """Drive testHead/testTail with a shared deterministic score table and
    compare the final metrics against kge.tester.Tester on the same scores."""
    import ctypes

    import jax
    import jax.numpy as jnp

    from skghoi_tpu.kge.models import TransE
    from skghoi_tpu.kge.tester import Tester

    tmpdir, _ = bench
    data = KGData.load(tmpdir)

    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=16)
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    tester = Tester(model, params, data, chunk_size=8)
    res = tester.run_link_prediction()

    base = native.NativeBase(in_path=tmpdir)
    base.import_test_files()
    lib = base.lib
    lib.initTest()
    E = data.ent_tot
    ph = np.zeros(E, np.int64)
    pt = np.zeros(E, np.int64)
    pr = np.zeros(E, np.int64)
    for idx in range(len(data.test)):
        lib.getHeadBatch(ph.ctypes.data, pt.ctypes.data, pr.ctypes.data)
        scores = np.asarray(
            model.apply(params, jnp.asarray(ph), jnp.asarray(pt), jnp.asarray(pr),
                        method="rank_scores"), np.float32)
        lib.testHead(scores.ctypes.data, ctypes.c_int64(idx), False)
        lib.getTailBatch(ph.ctypes.data, pt.ctypes.data, pr.ctypes.data)
        scores = np.asarray(
            model.apply(params, jnp.asarray(ph), jnp.asarray(pt), jnp.asarray(pr),
                        method="rank_scores"), np.float32)
        lib.testTail(scores.ctypes.data, ctypes.c_int64(idx), False)
    lib.test_link_prediction(False)

    np.testing.assert_allclose(lib.getTestLinkMRR(False), res.mrr, rtol=1e-5)
    np.testing.assert_allclose(lib.getTestLinkMR(False), res.mr, rtol=1e-5)
    np.testing.assert_allclose(lib.getTestLinkHit10(False), res.hit10, rtol=1e-5)
    np.testing.assert_allclose(lib.getTestLinkHit3(False), res.hit3, rtol=1e-5)
    np.testing.assert_allclose(lib.getTestLinkHit1(False), res.hit1, rtol=1e-5)
