"""End-to-end KGE slice: train TransE on a tiny structured KG, evaluate ranks.

The synthetic graph has a deterministic rule (r0 links i -> i+1 mod E) so a
properly trained TransE ranks the true tail near the top; this exercises
trainer + in-graph sampler + tester together.
"""

import numpy as np
import jax

from skghoi_tpu.kge import KGData, MarginLoss, NegativeSampling, Tester, Trainer, TransE
from skghoi_tpu.kge.sampling import DeviceKG


def ring_kg(n_ent=20):
    """All ring edges as train AND test: a memorization check.

    Held-out generalization is NOT testable at this scale — with 20 entities,
    filtered corruption (train-only, same as the reference backend) samples
    the held-out edges as negatives thousands of times, so the model actively
    anti-learns them.  Ranking the *train* triples exercises the identical
    trainer/tester machinery deterministically.
    """
    triples = np.asarray([[i, (i + 1) % n_ent, 0] for i in range(n_ent)], np.int64)
    return KGData.build(n_ent, 1, triples, valid=None, test=triples.copy())


def test_transe_memorizes_ring():
    data = ring_kg()
    kg = DeviceKG.from_kgdata(data)
    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=16, p_norm=1, norm_flag=True)
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])

    strategy = NegativeSampling(loss=MarginLoss(margin=5.0))
    trainer = Trainer(
        model, params, strategy, kg,
        nbatches=2, neg_rate=4, bern=False, train_times=300,
        alpha=0.5, opt_method="sgd", log_fn=lambda s: None,
    )
    params = trainer.run()

    tester = Tester(model, params, data, chunk_size=4)
    res = tester.run_link_prediction(log_fn=lambda s: None)
    assert res.hit10 > 0.9, res
    assert res.mr < 4, res

    acc, thr = tester.run_triple_classification()
    assert acc > 0.7, (acc, thr)


def test_checkpoint_roundtrip(tmp_path):
    data = ring_kg()
    kg = DeviceKG.from_kgdata(data)
    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=8)
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])
    trainer = Trainer(model, params, NegativeSampling(loss=MarginLoss(margin=1.0)), kg,
                      nbatches=1, train_times=1, log_fn=lambda s: None)
    path = str(tmp_path / "kge.ckpt")
    trainer.save_checkpoint(path)
    before = jax.tree_util.tree_leaves(trainer.params)[0]
    trainer.load_checkpoint(path)
    after = jax.tree_util.tree_leaves(trainer.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_type_constrained_eval():
    """Type constraints restrict candidates: constrained ranks <= raw ranks."""
    data = ring_kg()
    # All entities admissible for relation 0 except half of them.
    data.head_type = {0: np.arange(0, 20, 2)}
    data.tail_type = {0: np.arange(0, 20, 2)}
    kg = DeviceKG.from_kgdata(data)
    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=8)
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])
    tester = Tester(model, params, data, chunk_size=4)
    res = tester.run_link_prediction(type_constrain=True, log_fn=lambda s: None)
    # Constrained candidate pool is half the size -> MR bounded by ~pool size.
    assert res.mr <= 11, res


def test_distmult_softplus_adagrad_memorizes_ring():
    """The bilinear + softplus + adagrad + L2-regul path learns correctly
    (the FB15K237 DistMult gap is hyperparameters, not the pipeline)."""
    from skghoi_tpu.kge import DistMult, SoftplusLoss

    data = ring_kg()
    kg = DeviceKG.from_kgdata(data)
    m = DistMult(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=16)
    params = m.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])
    trainer = Trainer(
        m, params, NegativeSampling(loss=SoftplusLoss(), regul_rate=1.0), kg,
        nbatches=2, neg_rate=8, bern=True, train_times=500, alpha=0.5,
        opt_method="adagrad", log_fn=lambda s: None,
    )
    params = trainer.run()
    res = Tester(m, params, data, chunk_size=4).run_link_prediction(log_fn=lambda s: None)
    assert res.hit10 > 0.9, res


def test_transe_sigmoid_adv_memorizes_ring():
    """Regression for the margin_flag inversion: a sigmoid-adv TransE (the
    WN18RR adversarial recipe shape) must be constructed with
    ``margin=...`` so forward = margin - distance (higher-better, what
    SigmoidLoss optimizes). Without it, training is inverted and this
    memorization check collapses to ~0."""
    from skghoi_tpu.kge.losses import SigmoidLoss

    data = ring_kg()
    kg = DeviceKG.from_kgdata(data)
    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=16,
                   p_norm=1, norm_flag=False, margin=6.0)
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])

    strategy = NegativeSampling(loss=SigmoidLoss(adv_temperature=1.0))
    trainer = Trainer(
        model, params, strategy, kg,
        nbatches=2, neg_rate=8, bern=False, train_times=400,
        alpha=0.05, opt_method="adam", log_fn=lambda s: None,
        sampling_mode="oneside",
    )
    params = trainer.run()
    tester = Tester(model, params, data, chunk_size=4)
    res = tester.run_link_prediction(log_fn=lambda s: None)
    assert res.hit10 > 0.9, res


def test_train_kge_cli_passes_margin_for_sigmoid_loss():
    """The CLI constructor must apply OpenKE's margin_flag semantics."""
    import argparse

    from skghoi_tpu.tools.train_kge import MODELS, build_argparser

    parser = build_argparser()
    ns = parser.parse_args(["--data", "x", "--model", "transe", "--loss", "sigmoid",
                            "--margin", "6.0"])

    class D:
        ent_tot, rel_tot = 10, 2

    m = MODELS["transe"](ns, D)
    assert m.margin == 6.0
    ns2 = parser.parse_args(["--data", "x", "--model", "transe", "--loss", "margin",
                             "--margin", "6.0"])
    m2 = MODELS["transe"](ns2, D)
    assert m2.margin is None


def test_mesh_data_parallel_trainer_memorizes_ring():
    """DDP-style KGE training over the 8-device mesh: per-device in-graph
    sampling + pmean'd gradients must learn like the single-device path
    (OpenKE is single-GPU; this is the TPU-native scaling counterpart)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from skghoi_tpu.parallel.mesh import make_mesh

    data = ring_kg()
    kg = DeviceKG.from_kgdata(data)
    model = TransE(ent_tot=data.ent_tot, rel_tot=data.rel_tot, dim=16, p_norm=1, norm_flag=True)
    params = model.init(jax.random.PRNGKey(0), kg.train_h[:1], kg.train_t[:1], kg.train_r[:1])
    trainer = Trainer(
        model, params, NegativeSampling(loss=MarginLoss(margin=5.0)), kg,
        nbatches=2, neg_rate=4, bern=False, train_times=300,
        alpha=0.5, opt_method="sgd", log_fn=lambda s: None,
        mesh=make_mesh(),
    )
    params = trainer.run()
    res = Tester(model, params, data, chunk_size=4).run_link_prediction(log_fn=lambda s: None)
    assert res.hit10 > 0.9, res


def test_torch_adagrad_first_step_semantics():
    """Adagrad must use torch's rule g/(sqrt(accum)+eps): a tiny first
    gradient still takes a full ±lr step.  optax.adagrad's eps-inside-sqrt
    damps it ~10x at |g|=1e-6, which let SimplE's 11-row WN18RR relation
    tables collapse to zero under the L2 term (loss frozen at softplus(0))."""
    import numpy as np
    import jax.numpy as jnp
    import torch

    from skghoi_tpu.kge.trainer import make_optimizer

    g = np.asarray([1e-6, 1e-3, 0.05, -1e-6], np.float32)
    p = np.asarray([0.01, 0.01, 0.1, 0.01], np.float32)
    opt = make_optimizer("adagrad", 0.5)
    state = opt.init(jnp.asarray(p))
    upd, state = opt.update(jnp.asarray(g), state, jnp.asarray(p))

    tp = torch.nn.Parameter(torch.tensor(p))
    to = torch.optim.Adagrad([tp], lr=0.5)
    tp.grad = torch.tensor(g)
    to.step()
    want = (tp.detach().numpy() - p)
    np.testing.assert_allclose(np.asarray(upd), want, rtol=1e-5, atol=1e-7)

    # second step agrees too (accumulator carried)
    upd2, _ = opt.update(jnp.asarray(g), state, None)
    tp.grad = torch.tensor(g)
    to.step()
    want2 = tp.detach().numpy() - (p + want)
    np.testing.assert_allclose(np.asarray(upd2), want2, rtol=1e-5, atol=1e-7)
