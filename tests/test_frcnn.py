"""torchvision-format Faster R-CNN import path.

No torchvision in this environment, so parity evidence comes from:
(a) a synthetic state dict in the exact torchvision
``fasterrcnn_resnet50_fpn`` key layout (both pre- and post-0.13 variants)
that must convert and load into the Flax model;
(b) plain-torch oracles of the RPN head / TwoMLPHead / FastRCNNPredictor
(architectures documented in torchvision ``models/detection``) fed the same
weights — outputs must match the Flax modules;
(c) a numpy oracle of ``BoxCoder.decode_single``;
(d) a full-pipeline smoke: finite in-bounds detections with coherent masks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from skghoi_tpu.detect.frcnn import (
    FasterRCNN,
    FastRCNNPredictor,
    RPNHead,
    TwoMLPHead,
    anchors_for_level,
    decode_boxes,
    load_torch_fasterrcnn,
)


def synth_state_dict(rng, new_style=True):
    sd = {}

    def conv(name, o, i, k, bias=True):
        sd[name + ".weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05
        )
        if bias:
            sd[name + ".bias"] = torch.tensor(rng.standard_normal(o).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(rng.standard_normal(c).astype(np.float32) * 0.05)
        sd[name + ".running_mean"] = torch.tensor(rng.standard_normal(c).astype(np.float32) * 0.05)
        sd[name + ".running_var"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))

    def linear(name, o, i):
        sd[name + ".weight"] = torch.tensor(rng.standard_normal((o, i)).astype(np.float32) * 0.02)
        sd[name + ".bias"] = torch.tensor(rng.standard_normal(o).astype(np.float32) * 0.02)

    # --- backbone.body (resnet50, frozen BN) ---
    p = "backbone.body."
    conv(p + "conv1", 64, 3, 7, bias=False)
    bn(p + "bn1", 64)
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    in_ch = 64
    for li, (w, out) in enumerate(widths):
        blocks = (3, 4, 6, 3)[li]
        for b in range(blocks):
            tb = f"{p}layer{li + 1}.{b}"
            conv(f"{tb}.conv1", w, in_ch if b == 0 else out, 1, bias=False)
            bn(f"{tb}.bn1", w)
            conv(f"{tb}.conv2", w, w, 3, bias=False)
            bn(f"{tb}.bn2", w)
            conv(f"{tb}.conv3", out, w, 1, bias=False)
            bn(f"{tb}.bn3", out)
            if b == 0:
                conv(f"{tb}.downsample.0", out, in_ch, 1, bias=False)
                bn(f"{tb}.downsample.1", out)
        in_ch = out

    # --- FPN ---
    chans = [256, 512, 1024, 2048]
    for i, c in enumerate(chans):
        suffix = ".0" if new_style else ""
        conv(f"backbone.fpn.inner_blocks.{i}{suffix}", 256, c, 1)
        conv(f"backbone.fpn.layer_blocks.{i}{suffix}", 256, 256, 3)

    # --- RPN ---
    rpn_conv = "rpn.head.conv.0.0" if new_style else "rpn.head.conv"
    conv(rpn_conv, 256, 256, 3)
    conv("rpn.head.cls_logits", 3, 256, 1)
    conv("rpn.head.bbox_pred", 12, 256, 1)

    # --- RoI heads ---
    linear("roi_heads.box_head.fc6", 1024, 256 * 49)
    linear("roi_heads.box_head.fc7", 1024, 1024)
    linear("roi_heads.box_predictor.cls_score", 91, 1024)
    linear("roi_heads.box_predictor.bbox_pred", 91 * 4, 1024)
    return sd


@pytest.mark.parametrize("new_style", [True, False])
def test_state_dict_converts_and_loads(new_style):
    rng = np.random.default_rng(0)
    sd = synth_state_dict(rng, new_style=new_style)
    variables = load_torch_fasterrcnn(sd)
    model = FasterRCNN()
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.asarray([[128.0, 128.0]])
    ref = model.init(jax.random.PRNGKey(0), img, sizes)

    def shapes(tree, out, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                shapes(v, out, prefix + k + "/")
            else:
                out[prefix + k] = tuple(np.shape(v))
        return out

    got = shapes(jax.tree_util.tree_map(np.asarray, variables), {})
    want = shapes(jax.tree_util.tree_map(np.asarray, jax.device_get(ref)), {})
    assert got == want


def test_rpn_and_box_heads_match_torch_oracle():
    rng = np.random.default_rng(1)
    sd = synth_state_dict(rng)

    feat = rng.standard_normal((1, 256, 10, 12)).astype(np.float32)

    # torch oracle of torchvision RPNHead
    with torch.no_grad():
        t = torch.tensor(feat)
        conv = torch.nn.Conv2d(256, 256, 3, padding=1)
        conv.weight.copy_(sd["rpn.head.conv.0.0.weight"])
        conv.bias.copy_(sd["rpn.head.conv.0.0.bias"])
        cls = torch.nn.Conv2d(256, 3, 1)
        cls.weight.copy_(sd["rpn.head.cls_logits.weight"])
        cls.bias.copy_(sd["rpn.head.cls_logits.bias"])
        box = torch.nn.Conv2d(256, 12, 1)
        box.weight.copy_(sd["rpn.head.bbox_pred.weight"])
        box.bias.copy_(sd["rpn.head.bbox_pred.bias"])
        h = torch.relu(conv(t))
        want_logits = cls(h)
        want_deltas = box(h)
        # torchvision's concat_box_prediction_layers layout: [N, A, H, W] ->
        # permute to [N, H, W, A] -> flatten
        want_logits = want_logits.permute(0, 2, 3, 1).reshape(1, -1).numpy()
        want_deltas = (
            want_deltas.view(1, 3, 4, 10, 12).permute(0, 3, 4, 1, 2).reshape(1, -1, 4).numpy()
        )

    variables = load_torch_fasterrcnn(sd)
    rpn_vars = {"params": variables["params"]["rpn_head"]}
    got_logits, got_deltas = RPNHead().apply(rpn_vars, jnp.asarray(feat.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_deltas), want_deltas, rtol=1e-4, atol=1e-4)

    # box head + predictor oracle (flatten order is the crux: NCHW)
    pooled = rng.standard_normal((5, 256, 7, 7)).astype(np.float32)
    with torch.no_grad():
        fc6 = torch.nn.Linear(256 * 49, 1024)
        fc6.weight.copy_(sd["roi_heads.box_head.fc6.weight"])
        fc6.bias.copy_(sd["roi_heads.box_head.fc6.bias"])
        fc7 = torch.nn.Linear(1024, 1024)
        fc7.weight.copy_(sd["roi_heads.box_head.fc7.weight"])
        fc7.bias.copy_(sd["roi_heads.box_head.fc7.bias"])
        cls_score = torch.nn.Linear(1024, 91)
        cls_score.weight.copy_(sd["roi_heads.box_predictor.cls_score.weight"])
        cls_score.bias.copy_(sd["roi_heads.box_predictor.cls_score.bias"])
        bbox_pred = torch.nn.Linear(1024, 91 * 4)
        bbox_pred.weight.copy_(sd["roi_heads.box_predictor.bbox_pred.weight"])
        bbox_pred.bias.copy_(sd["roi_heads.box_predictor.bbox_pred.bias"])
        x = torch.relu(fc7(torch.relu(fc6(torch.tensor(pooled).flatten(1)))))
        want_scores = cls_score(x).numpy()
        want_boxdeltas = bbox_pred(x).view(5, 91, 4).numpy()

    head_x = TwoMLPHead().apply(
        {"params": variables["params"]["box_head"]},
        jnp.asarray(pooled.transpose(0, 2, 3, 1)),
    )
    got_scores, got_boxdeltas = FastRCNNPredictor().apply(
        {"params": variables["params"]["box_predictor"]}, head_x
    )
    np.testing.assert_allclose(np.asarray(got_scores), want_scores, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_boxdeltas), want_boxdeltas, rtol=1e-3, atol=1e-3)


def test_decode_boxes_matches_torchvision_formula():
    rng = np.random.default_rng(2)
    anchors = np.abs(rng.uniform(0, 100, (20, 4))).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(4, 60, (20, 2))
    deltas = rng.standard_normal((20, 4)).astype(np.float32) * 0.4
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        got = np.asarray(decode_boxes(jnp.asarray(anchors), jnp.asarray(deltas), w))
        wx, wy, ww, wh = w
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        ax = anchors[:, 0] + aw / 2
        ay = anchors[:, 1] + ah / 2
        dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
        dw = np.minimum(deltas[:, 2] / ww, np.log(1000 / 16))
        dh = np.minimum(deltas[:, 3] / wh, np.log(1000 / 16))
        cx, cy = dx * aw + ax, dy * ah + ay
        bw, bh = np.exp(dw) * aw, np.exp(dh) * ah
        want = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_anchor_grid_matches_torchvision_shapes():
    a = anchors_for_level((64, 96), 4, 32)
    assert a.shape == (16 * 24 * 3, 4)
    # first cell's ratio-1 anchor: rounded +/- size/2 around (0, 0)
    sq = a[1]
    np.testing.assert_allclose(sq, [-16, -16, 16, 16])
    # ratio 0.5 (wide): w = round(32/sqrt(0.5)/2)*2 = 46, h = round(32*sqrt(0.5)/2)*2
    wide = a[0]
    assert (wide[2] - wide[0]) > (wide[3] - wide[1])


def test_full_pipeline_smoke():
    rng = np.random.default_rng(3)
    model = FasterRCNN(pre_nms_top_n=200, post_nms_top_n=64, score_topk=256,
                       detections_per_img=20)
    img = jnp.asarray(rng.standard_normal((1, 128, 192, 3)).astype(np.float32))
    sizes = jnp.asarray([[120.0, 190.0]])
    variables = model.init(jax.random.PRNGKey(0), img, sizes)
    det = model.apply(variables, img, sizes)
    assert det.boxes.shape == (1, 20, 4) and det.valid.shape == (1, 20)
    b = np.asarray(det.boxes)[np.asarray(det.valid)]
    assert np.isfinite(b).all()
    assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
    assert (b[:, 2] <= 190.0).all() and (b[:, 3] <= 120.0).all()
    s = np.asarray(det.scores)[np.asarray(det.valid)]
    assert ((s >= 0) & (s <= 1)).all()


def test_preprocess_detections_end_to_end(tmp_path):
    """Checkpoint file -> converted weights -> detector fn -> cached JSONs,
    exactly the reference's preprocessing.py flow (small transform envelope)."""
    from skghoi_tpu.detect.generate import generate_model_detections
    from skghoi_tpu.tools.preprocess_detections import (
        build_detector_fn,
        load_checkpoint_state_dict,
        load_torch_fasterrcnn,
    )

    rng = np.random.default_rng(7)
    ckpt = tmp_path / "frcnn.pt"
    torch.save({"model_state_dict": synth_state_dict(rng)}, ckpt)
    variables = load_torch_fasterrcnn(load_checkpoint_state_dict(str(ckpt)))
    detector = build_detector_fn(
        variables, score_thresh=0.0, nms_thresh=0.5, num_detections=10,
        min_size=96, max_size=160, canvas=(128, 192),
        pre_nms_top_n=100, post_nms_top_n=32, score_topk=128,
    )

    class FakeDataset:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (rng.uniform(0, 255, (50 + 10 * i, 70, 3)).astype(np.uint8), None)

        def filename(self, i):
            return f"img_{i}.jpg"

    cache = tmp_path / "cache"
    generate_model_detections(
        detector, FakeDataset(), str(cache), score_thresh=0.0,
        label_map={str(i): i - 1 for i in range(1, 81)},  # coco->hico style
    )
    import json as _json

    for i in range(2):
        with open(cache / f"img_{i}.json") as f:
            blob = _json.load(f)
        assert set(blob) == {"boxes", "labels", "scores"}
        n = len(blob["boxes"])
        assert len(blob["labels"]) == n == len(blob["scores"])
        for box in blob["boxes"]:
            x1, y1, x2, y2 = box
            assert 0 <= x1 <= x2 <= 70 + 1e-3 and 0 <= y1 <= y2 <= 60 + 1e-3
        assert all(0 <= l < 80 for l in blob["labels"])
