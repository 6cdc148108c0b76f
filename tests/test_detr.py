"""DETR-R50 import path: torch oracles for every transformer piece.

torch core ships ``nn.MultiheadAttention`` — the exact module whose packed
weight layout DETR checkpoints use — so the attention math, the post-norm
encoder/decoder layers (public DETR ``transformer.py`` forward_post), and
the sine positional embedding are each verified against a plain-torch
oracle with shared weights.  The converter is exercised on a synthetic
state dict in the facebookresearch/detr key layout.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch

from skghoi_tpu.detect.detr import (
    DETR,
    DecoderLayer,
    EncoderLayer,
    PackedMHA,
    load_torch_detr,
    sine_position_embedding,
)

D = 256


def mha_params(rng, prefix, sd):
    sd[prefix + ".in_proj_weight"] = torch.tensor(
        rng.standard_normal((3 * D, D)).astype(np.float32) * 0.05
    )
    sd[prefix + ".in_proj_bias"] = torch.tensor(rng.standard_normal(3 * D).astype(np.float32) * 0.05)
    sd[prefix + ".out_proj.weight"] = torch.tensor(
        rng.standard_normal((D, D)).astype(np.float32) * 0.05
    )
    sd[prefix + ".out_proj.bias"] = torch.tensor(rng.standard_normal(D).astype(np.float32) * 0.05)


def linear_params(rng, prefix, sd, o, i):
    sd[prefix + ".weight"] = torch.tensor(rng.standard_normal((o, i)).astype(np.float32) * 0.05)
    sd[prefix + ".bias"] = torch.tensor(rng.standard_normal(o).astype(np.float32) * 0.05)


def ln_params(rng, prefix, sd):
    sd[prefix + ".weight"] = torch.tensor(rng.uniform(0.5, 1.5, D).astype(np.float32))
    sd[prefix + ".bias"] = torch.tensor(rng.standard_normal(D).astype(np.float32) * 0.05)


def torch_mha(sd, prefix):
    m = torch.nn.MultiheadAttention(D, 8, batch_first=True)
    with torch.no_grad():
        m.in_proj_weight.copy_(sd[prefix + ".in_proj_weight"])
        m.in_proj_bias.copy_(sd[prefix + ".in_proj_bias"])
        m.out_proj.weight.copy_(sd[prefix + ".out_proj.weight"])
        m.out_proj.bias.copy_(sd[prefix + ".out_proj.bias"])
    return m.eval()


def flax_mha_params(sd, prefix):
    return {
        "in_proj_weight": sd[prefix + ".in_proj_weight"].numpy(),
        "in_proj_bias": sd[prefix + ".in_proj_bias"].numpy(),
        "out_proj_kernel": sd[prefix + ".out_proj.weight"].numpy(),
        "out_proj_bias": sd[prefix + ".out_proj.bias"].numpy(),
    }


def test_packed_mha_matches_torch():
    rng = np.random.default_rng(0)
    sd = {}
    mha_params(rng, "attn", sd)
    q = rng.standard_normal((2, 7, D)).astype(np.float32)
    k = rng.standard_normal((2, 9, D)).astype(np.float32)
    v = rng.standard_normal((2, 9, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = torch_mha(sd, "attn")(torch.tensor(q), torch.tensor(k), torch.tensor(v))
    got = PackedMHA().apply(
        {"params": flax_mha_params(sd, "attn")}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


class TorchEncoderLayer(torch.nn.Module):
    """Public DETR TransformerEncoderLayer.forward_post."""

    def __init__(self, sd, p):
        super().__init__()
        self.self_attn = torch_mha(sd, p + ".self_attn")
        self.linear1 = torch.nn.Linear(D, 2048)
        self.linear2 = torch.nn.Linear(2048, D)
        self.norm1 = torch.nn.LayerNorm(D)
        self.norm2 = torch.nn.LayerNorm(D)
        with torch.no_grad():
            for name, mod in [("linear1", self.linear1), ("linear2", self.linear2),
                              ("norm1", self.norm1), ("norm2", self.norm2)]:
                mod.weight.copy_(sd[f"{p}.{name}.weight"])
                mod.bias.copy_(sd[f"{p}.{name}.bias"])

    def forward(self, src, pos):
        q = k = src + pos
        src2, _ = self.self_attn(q, k, src)
        src = self.norm1(src + src2)
        src2 = self.linear2(torch.relu(self.linear1(src)))
        return self.norm2(src + src2)


class TorchDecoderLayer(torch.nn.Module):
    def __init__(self, sd, p):
        super().__init__()
        self.self_attn = torch_mha(sd, p + ".self_attn")
        self.multihead_attn = torch_mha(sd, p + ".multihead_attn")
        self.linear1 = torch.nn.Linear(D, 2048)
        self.linear2 = torch.nn.Linear(2048, D)
        self.norm1 = torch.nn.LayerNorm(D)
        self.norm2 = torch.nn.LayerNorm(D)
        self.norm3 = torch.nn.LayerNorm(D)
        with torch.no_grad():
            for name in ["linear1", "linear2", "norm1", "norm2", "norm3"]:
                mod = getattr(self, name)
                mod.weight.copy_(sd[f"{p}.{name}.weight"])
                mod.bias.copy_(sd[f"{p}.{name}.bias"])

    def forward(self, tgt, memory, pos, query_pos):
        q = k = tgt + query_pos
        tgt2, _ = self.self_attn(q, k, tgt)
        tgt = self.norm1(tgt + tgt2)
        tgt2, _ = self.multihead_attn(tgt + query_pos, memory + pos, memory)
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.linear2(torch.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


def enc_layer_sd(rng, p, sd):
    mha_params(rng, p + ".self_attn", sd)
    linear_params(rng, p + ".linear1", sd, 2048, D)
    linear_params(rng, p + ".linear2", sd, D, 2048)
    ln_params(rng, p + ".norm1", sd)
    ln_params(rng, p + ".norm2", sd)


def dec_layer_sd(rng, p, sd):
    mha_params(rng, p + ".self_attn", sd)
    mha_params(rng, p + ".multihead_attn", sd)
    linear_params(rng, p + ".linear1", sd, 2048, D)
    linear_params(rng, p + ".linear2", sd, D, 2048)
    ln_params(rng, p + ".norm1", sd)
    ln_params(rng, p + ".norm2", sd)
    ln_params(rng, p + ".norm3", sd)


def test_encoder_decoder_stack_matches_torch():
    """Two chained encoder layers + two decoder layers, shared weights."""
    rng = np.random.default_rng(1)
    sd = {}
    for i in range(2):
        enc_layer_sd(rng, f"transformer.encoder.layers.{i}", sd)
        dec_layer_sd(rng, f"transformer.decoder.layers.{i}", sd)

    src = rng.standard_normal((1, 40, D)).astype(np.float32)
    pos = rng.standard_normal((1, 40, D)).astype(np.float32)
    qpos = rng.standard_normal((1, 10, D)).astype(np.float32)

    with torch.no_grad():
        x = torch.tensor(src)
        for i in range(2):
            x = TorchEncoderLayer(sd, f"transformer.encoder.layers.{i}")(x, torch.tensor(pos))
        mem = x
        t = torch.zeros(1, 10, D)
        for i in range(2):
            t = TorchDecoderLayer(sd, f"transformer.decoder.layers.{i}")(
                t, mem, torch.tensor(pos), torch.tensor(qpos)
            )
        want_mem, want_tgt = mem.numpy(), t.numpy()

    from skghoi_tpu.detect.detr import load_torch_detr  # converter helpers
    def enc_params(i):
        p = f"transformer.encoder.layers.{i}"
        return {
            "self_attn": flax_mha_params(sd, p + ".self_attn"),
            "linear1": {"kernel": sd[p + ".linear1.weight"].numpy().T, "bias": sd[p + ".linear1.bias"].numpy()},
            "linear2": {"kernel": sd[p + ".linear2.weight"].numpy().T, "bias": sd[p + ".linear2.bias"].numpy()},
            "norm1": {"scale": sd[p + ".norm1.weight"].numpy(), "bias": sd[p + ".norm1.bias"].numpy()},
            "norm2": {"scale": sd[p + ".norm2.weight"].numpy(), "bias": sd[p + ".norm2.bias"].numpy()},
        }

    def dec_params(i):
        p = f"transformer.decoder.layers.{i}"
        return {
            "self_attn": flax_mha_params(sd, p + ".self_attn"),
            "multihead_attn": flax_mha_params(sd, p + ".multihead_attn"),
            "linear1": {"kernel": sd[p + ".linear1.weight"].numpy().T, "bias": sd[p + ".linear1.bias"].numpy()},
            "linear2": {"kernel": sd[p + ".linear2.weight"].numpy().T, "bias": sd[p + ".linear2.bias"].numpy()},
            "norm1": {"scale": sd[p + ".norm1.weight"].numpy(), "bias": sd[p + ".norm1.bias"].numpy()},
            "norm2": {"scale": sd[p + ".norm2.weight"].numpy(), "bias": sd[p + ".norm2.bias"].numpy()},
            "norm3": {"scale": sd[p + ".norm3.weight"].numpy(), "bias": sd[p + ".norm3.bias"].numpy()},
        }

    x = jnp.asarray(src)
    for i in range(2):
        x = EncoderLayer().apply({"params": enc_params(i)}, x, jnp.asarray(pos))
    got_mem = x
    t = jnp.zeros((1, 10, D))
    for i in range(2):
        t = DecoderLayer().apply(
            {"params": dec_params(i)}, t, got_mem, jnp.asarray(pos), jnp.asarray(qpos)
        )
    np.testing.assert_allclose(np.asarray(got_mem), want_mem, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), want_tgt, rtol=1e-4, atol=1e-4)


def test_sine_position_embedding_matches_detr_oracle():
    """Oracle: the cumsum-over-mask formulation from public DETR
    position_encoding.py with an all-valid mask."""
    h, w, nf = 7, 9, 128
    not_mask = torch.ones(1, h, w)
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(nf, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / nf)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    want = torch.cat((pos_y, pos_x), dim=3)[0].numpy()
    got = sine_position_embedding(h, w, nf)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def synth_detr_state_dict(rng, num_classes=91):
    import tests.test_frcnn as tf

    sd = {}
    # resnet body under backbone.0.body.
    full = tf.synth_state_dict(rng)
    for k, v in full.items():
        if k.startswith("backbone.body."):
            sd["backbone.0.body." + k[len("backbone.body."):]] = v
    sd["input_proj.weight"] = torch.tensor(
        rng.standard_normal((D, 2048, 1, 1)).astype(np.float32) * 0.05
    )
    sd["input_proj.bias"] = torch.tensor(rng.standard_normal(D).astype(np.float32) * 0.05)
    for i in range(6):
        enc_layer_sd(rng, f"transformer.encoder.layers.{i}", sd)
        dec_layer_sd(rng, f"transformer.decoder.layers.{i}", sd)
    ln_params(rng, "transformer.decoder.norm", sd)
    sd["query_embed.weight"] = torch.tensor(
        rng.standard_normal((100, D)).astype(np.float32) * 0.05
    )
    linear_params(rng, "class_embed", sd, num_classes + 1, D)
    for i in range(3):
        o = 4 if i == 2 else D
        linear_params(rng, f"bbox_embed.layers.{i}", sd, o, D)
    return sd


def test_converter_and_full_pipeline():
    rng = np.random.default_rng(3)
    sd = synth_detr_state_dict(rng)
    variables = load_torch_detr(sd)
    model = DETR()
    img = jnp.asarray(rng.standard_normal((1, 128, 160, 3)).astype(np.float32))
    sizes = jnp.asarray([[100.0, 150.0]])
    ref = model.init(jax.random.PRNGKey(0), img, sizes)

    flat_got = jax.tree_util.tree_map(np.shape, variables)
    flat_want = jax.tree_util.tree_map(np.shape, jax.device_get(ref))
    assert flat_got == flat_want

    det = model.apply(variables, img, sizes)
    assert det.boxes.shape == (1, 100, 4)
    b = np.asarray(det.boxes)
    s = np.asarray(det.scores)
    assert np.isfinite(b).all() and ((s >= 0) & (s <= 1)).all()
    # cxcywh sigmoid in [0,1] -> xyxy within ~[-w/2, 1.5w]
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    lab = np.asarray(det.labels)
    assert ((lab >= 0) & (lab < 91)).all()


def test_detr_detector_fn_end_to_end(tmp_path):
    from skghoi_tpu.detect.generate import generate_model_detections
    from skghoi_tpu.tools.preprocess_detections import build_detr_detector_fn

    rng = np.random.default_rng(9)
    variables = load_torch_detr(synth_detr_state_dict(rng))
    detector = build_detr_detector_fn(
        variables, score_thresh=0.0, min_size=96, max_size=160, canvas=(128, 192)
    )

    class FakeDataset:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8), None)

        def filename(self, i):
            return "img.jpg"

    cache = tmp_path / "cache"
    generate_model_detections(detector, FakeDataset(), str(cache), score_thresh=0.0)
    import json

    with open(cache / "img.json") as f:
        blob = json.load(f)
    assert len(blob["boxes"]) == len(blob["labels"]) == len(blob["scores"]) > 0
    assert all(0 <= s <= 1 for s in blob["scores"])


def test_hico_head_surgery_keep_rows():
    """81-class surgery keeps exactly the main_detr.py:144-151 logit rows."""
    from skghoi_tpu.detect.detr import (
        DETR_SURGERY_KEEP,
        HICO_TO_DETR80,
        hico_head_surgery,
        load_torch_detr,
    )

    rng = np.random.default_rng(5)
    sd = synth_detr_state_dict(rng)
    out = hico_head_surgery(sd)
    w0 = np.asarray(sd["class_embed.weight"])
    w1 = np.asarray(out["class_embed.weight"])
    assert w1.shape == (81, D) and np.asarray(out["class_embed.bias"]).shape == (81,)
    np.testing.assert_array_equal(w1, w0[DETR_SURGERY_KEEP])
    assert out["class_embed.weight"].shape[0] == 81  # 80 classes + no-object

    # conversion table: a permutation of 0..79 with person (HICO 49) -> 0
    assert sorted(HICO_TO_DETR80) == list(range(80))
    assert HICO_TO_DETR80[49] == 0

    # converted dict loads into the 80-class model
    variables = load_torch_detr(out)
    assert variables["params"]["class_embed"]["kernel"].shape == (D, 81)
    model = DETR(num_classes=80)
    img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    det = model.apply(variables, img, jnp.asarray([[64.0, 96.0]]))
    assert ((np.asarray(det.labels) >= 0) & (np.asarray(det.labels) < 80)).all()


def test_detr_finetune_overfits_one_box():
    """The surgery fine-tune flow (main_detr.py:139-196): Hungarian-matched
    CE + L1 + GIoU on one image localizes the single GT box."""
    import optax

    from skghoi_tpu.detect.detr import (
        detr_assignments,
        detr_set_loss,
    )

    model = DETR(num_classes=80, num_layers=2, num_queries=10)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)), jnp.float32)
    # GT in normalized cxcywh (DETR target convention)
    gt_boxes = jnp.asarray([[[0.4, 0.5, 0.35, 0.4]]])
    gt_labels = jnp.asarray([[7]])
    gt_valid = jnp.ones((1, 1), bool)

    variables = dict(model.init(jax.random.PRNGKey(0), images, jnp.asarray([[64.0, 96.0]])))
    params = variables.pop("params")
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    fwd = jax.jit(
        lambda p: model.apply({"params": p, **variables}, images, method=DETR.raw)
    )

    @jax.jit
    def step(params, opt_state, assignments):
        def loss_fn(p):
            logits, boxes = model.apply({"params": p, **variables}, images, method=DETR.raw)
            losses = detr_set_loss(logits, boxes, assignments, gt_boxes, gt_labels, gt_valid)
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    first = None
    for i in range(120):
        logits, boxes = fwd(params)
        assignments = jnp.asarray(
            detr_assignments(logits, boxes, gt_boxes, gt_labels, gt_valid)
        )
        params, opt_state, loss = step(params, opt_state, assignments)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.5, (first, final)

    logits, boxes = fwd(params)
    probs = np.asarray(jax.nn.softmax(logits, -1))[0, :, :-1]
    best = int(np.argmax(probs.max(axis=1)))
    assert int(np.argmax(probs[best])) == 7
    bb = np.asarray(boxes)[0, best]
    gt = np.asarray(gt_boxes)[0, 0]
    assert np.abs(bb - gt).max() < 0.1, (bb, gt)
