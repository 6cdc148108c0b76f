"""Scanned-tail ResNet (nn.scan over identical-shape bottlenecks) equivalence.

``ResNet50(scan_blocks=True)`` folds each stage's tail blocks into one
``lax.scan`` to shrink the train-step HLO (XLA compile time is the driver's
multi-chip-gate budget).  The math must be unchanged: these tests pin the
scanned forward to the unrolled forward given the same torch checkpoint, and
the optimizer's frozen-stage labeling on the new ``layer{s}_rest`` keys.
"""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu.models.backbone import load_torch_resnet50
from skghoi_tpu.models.resnet import ResNet50
from skghoi_tpu.train.optimizer import _label_params

from test_torch_converter import build_torch_style_state_dict


def _both_variants(sd):
    p_scan, s_scan = load_torch_resnet50(sd, scan_blocks=True)
    p_unroll, s_unroll = load_torch_resnet50(sd, scan_blocks=False)
    return (
        (ResNet50(scan_blocks=True), {"params": p_scan, "batch_stats": s_scan}),
        (ResNet50(scan_blocks=False), {"params": p_unroll, "batch_stats": s_unroll}),
    )


def test_scan_matches_unrolled_forward():
    sd = build_torch_style_state_dict(np.random.default_rng(0))
    (m_scan, v_scan), (m_unroll, v_unroll) = _both_variants(sd)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 96, 3)), jnp.float32)
    out_scan = m_scan.apply(v_scan, x)
    out_unroll = m_unroll.apply(v_unroll, x)
    assert len(out_scan) == len(out_unroll) == 4
    for a, b in zip(out_scan, out_unroll):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_scan_init_structure_matches_converter():
    sd = build_torch_style_state_dict(np.random.default_rng(0))
    params, stats = load_torch_resnet50(sd, scan_blocks=True)
    model = ResNet50(scan_blocks=True)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: np.asarray(a).shape, tree)

    assert shapes(init_vars["params"]) == shapes(params)
    assert shapes(init_vars["batch_stats"]) == shapes(stats)
    # The stacked tail carries blocks 1..N-1: layer3 has 6 blocks -> 5 stacked.
    assert params["layer3_rest"]["conv1"]["kernel"].shape[0] == 5


def test_scan_grads_match_unrolled():
    sd = build_torch_style_state_dict(np.random.default_rng(0))
    (m_scan, v_scan), (m_unroll, v_unroll) = _both_variants(sd)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 64, 64, 3)), jnp.float32)

    def loss(model, variables):
        def f(p):
            outs = model.apply({"params": p, "batch_stats": variables["batch_stats"]}, x)
            return sum(jnp.sum(o**2) for o in outs)

        return jax.grad(f)(variables["params"])

    g_scan = loss(m_scan, v_scan)
    g_unroll = loss(m_unroll, v_unroll)

    def close(a, b):
        # The synthetic BN stats make activations (and grads) O(1e3); scan's
        # backward reassociates float32 sums, so tolerance scales with the
        # gradient magnitude rather than an absolute epsilon.
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-4 * max(1.0, np.abs(b).max()))

    # Compare a shared-name leaf (block 0 of stage 2) and a stacked-vs-named
    # tail leaf (layer1 block 1 == layer1_rest[0]).
    close(g_scan["layer2_block0"]["conv2"]["kernel"],
          g_unroll["layer2_block0"]["conv2"]["kernel"])
    close(g_scan["layer1_rest"]["conv1"]["kernel"][0],
          g_unroll["layer1_block1"]["conv1"]["kernel"])


def test_frozen_labels_cover_scanned_tail():
    model = ResNet50(scan_blocks=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    labels = _label_params({"detector": params}, frozen_stages=1)
    flat = {
        jax.tree_util.keystr(path): label
        for path, label in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    for key, label in flat.items():
        if "layer1" in key or "stem" in key or "bn" in key.lower():
            assert label == "frozen", (key, label)
        else:
            assert label in ("detector", "head"), (key, label)
    assert any("layer1_rest" in k for k in flat)
    # layer2's scanned tail must NOT be frozen at frozen_stages=1.
    assert any("layer2_rest" in k and v == "detector" for k, v in flat.items())
