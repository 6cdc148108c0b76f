"""DETR-R50: torch checkpoint import + fixed-shape Flax inference.

The reference's best stage-1 detections come from a DETR-R50 fine-tuned on
HICO-DET (``hicodet/detections/main_detr.py``; its ``detr/`` submodule is
absent from the checkout, mAP 50.6 per ``detections/README.md:18``).  This
module re-expresses the public DETR-R50 architecture in Flax so those
checkpoints (facebookresearch/detr ``state_dict`` layout) can generate
detections here:

- ResNet-50 body (frozen BN) -> C5, 1x1 input projection to 256;
- sine positional embeddings (128 feats per axis, temperature 10000,
  normalized to 2*pi);
- 6-layer post-norm transformer encoder / decoder (8 heads, FFN 2048),
  100 learned object queries, final decoder LayerNorm;
- class head (``num_classes + 1`` logits incl. no-object) and 3-layer box
  MLP producing normalized cxcywh, sigmoid.

Inference is one jit: all shapes static (100 queries), no dropout.  The
attention math is written against torch ``nn.MultiheadAttention``'s packed
``in_proj_weight`` layout so the converter is a direct slice.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.models.backbone import load_torch_resnet50
from skghoi_tpu.models.resnet import ResNet50

Array = jax.Array

D_MODEL = 256
N_HEADS = 8
FFN_DIM = 2048
N_LAYERS = 6
N_QUERIES = 100


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0) -> np.ndarray:
    """DETR ``PositionEmbeddingSine`` for a fully-valid [h, w] grid ->
    [h, w, 256] (y-features then x-features, sin/cos interleaved)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float64)[:, None] / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float64)[None, :] / (w + eps) * scale)
    y = np.broadcast_to(y, (h, w))
    x = np.broadcast_to(x, (h, w))
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


class PackedMHA(nn.Module):
    """torch ``nn.MultiheadAttention`` semantics with packed qkv projection."""

    num_heads: int = N_HEADS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        d = q.shape[-1]
        in_w = self.param("in_proj_weight", nn.initializers.lecun_normal(), (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        out_w = self.param("out_proj_kernel", nn.initializers.lecun_normal(), (d, d))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
        qp = q @ in_w[:d].T + in_b[:d]
        kp = k @ in_w[d:2 * d].T + in_b[d:2 * d]
        vp = v @ in_w[2 * d:].T + in_b[2 * d:]
        hd = d // self.num_heads

        def split(x):  # [B, L, D] -> [B, H, L, hd]
            b, l = x.shape[0], x.shape[1]
            return x.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        b, l = q.shape[0], q.shape[1]
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return out @ out_w.T + out_b


class EncoderLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src: Array, pos: Array) -> Array:
        q = k = src + pos
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + PackedMHA(name="self_attn")(q, k, src))
        ff = nn.Dense(FFN_DIM, name="linear1")(src)
        ff = nn.Dense(D_MODEL, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + ff)


class DecoderLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, pos: Array, query_pos: Array) -> Array:
        q = k = tgt + query_pos
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + PackedMHA(name="self_attn")(q, k, tgt))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            tgt + PackedMHA(name="multihead_attn")(tgt + query_pos, memory + pos, memory)
        )
        ff = nn.Dense(FFN_DIM, name="linear1")(tgt)
        ff = nn.Dense(D_MODEL, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + ff)


class DETRDetections(NamedTuple):
    boxes: Array  # [B, Q, 4] xyxy in image coordinates
    labels: Array  # [B, Q]
    scores: Array  # [B, Q]


class DETR(nn.Module):
    """DETR-R50: images -> per-query (box, label, score); ``raw`` method for
    training (set-prediction loss needs the unpostprocessed outputs)."""

    num_classes: int = 91  # COCO id space; logits have +1 no-object slot
    num_layers: int = N_LAYERS
    num_queries: int = N_QUERIES
    dtype: Any = jnp.float32

    def setup(self):
        self.body = ResNet50(dtype=self.dtype)
        self.input_proj = nn.Conv(D_MODEL, (1, 1), name="input_proj", dtype=self.dtype)
        self.encoder = [EncoderLayer(name=f"enc{i}") for i in range(self.num_layers)]
        self.decoder = [DecoderLayer(name=f"dec{i}") for i in range(self.num_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, D_MODEL)
        )
        self.class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        self.bbox_mlp = [
            nn.Dense(D_MODEL, name="bbox0"),
            nn.Dense(D_MODEL, name="bbox1"),
            nn.Dense(4, name="bbox2"),
        ]

    def raw(self, images: Array) -> Tuple[Array, Array]:
        """-> (class logits [B, Q, C+1] fp32, boxes cxcywh in [0,1])."""
        c5 = self.body(images)[-1]
        feat = self.input_proj(c5.astype(self.dtype))
        b, fh, fw, _ = feat.shape
        pos = jnp.asarray(sine_position_embedding(fh, fw)).reshape(1, fh * fw, D_MODEL)
        src = feat.reshape(b, fh * fw, D_MODEL)

        x = src
        for layer in self.encoder:
            x = layer(x, pos)
        memory = x

        query_pos = jnp.broadcast_to(
            self.query_embed[None], (b, self.num_queries, D_MODEL)
        )
        tgt = jnp.zeros_like(query_pos)
        for layer in self.decoder:
            tgt = layer(tgt, memory, pos, query_pos)
        hs = self.decoder_norm(tgt)

        logits = self.class_embed(hs)  # [B, Q, C+1]
        xb = hs
        for i, layer in enumerate(self.bbox_mlp):
            xb = layer(xb)
            if i < 2:
                xb = nn.relu(xb)
        boxes_cxcywh = jax.nn.sigmoid(xb)
        return logits.astype(jnp.float32), boxes_cxcywh.astype(jnp.float32)

    def __call__(self, images: Array, image_sizes: Array) -> DETRDetections:
        """``images`` [B, H, W, 3] normalized; ``image_sizes`` [B, 2] (h, w)
        original sizes the boxes are scaled to (``PostProcess`` semantics)."""
        logits, boxes_cxcywh = self.raw(images)

        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # drop no-object
        scores = jnp.max(probs, axis=-1)
        labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)

        cx, cy, bw, bh = jnp.moveaxis(boxes_cxcywh, -1, 0)
        hgt = image_sizes[:, None, 0]
        wid = image_sizes[:, None, 1]
        boxes = jnp.stack(
            [(cx - bw / 2) * wid, (cy - bh / 2) * hgt,
             (cx + bw / 2) * wid, (cy + bh / 2) * hgt], axis=-1
        )
        return DETRDetections(boxes=boxes, labels=labels, scores=scores)


# --------------------------------------------------------------------------
# facebookresearch/detr state_dict -> Flax variables
# --------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd, name):
    return {"kernel": _np(sd[name + ".weight"]).T, "bias": _np(sd[name + ".bias"])}


def _ln(sd, name):
    return {"scale": _np(sd[name + ".weight"]), "bias": _np(sd[name + ".bias"])}


def _mha(sd, name):
    return {
        "in_proj_weight": _np(sd[name + ".in_proj_weight"]),
        "in_proj_bias": _np(sd[name + ".in_proj_bias"]),
        "out_proj_kernel": _np(sd[name + ".out_proj.weight"]),
        "out_proj_bias": _np(sd[name + ".out_proj.bias"]),
    }


def load_torch_detr(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a facebookresearch/detr ``state_dict`` (detr-r50) onto
    :class:`DETR` variables."""
    sd = state_dict
    body_params, body_stats = load_torch_resnet50(sd, prefix="backbone.0.body.")

    params: Dict[str, Any] = {"body": body_params}
    params["input_proj"] = {
        "kernel": np.transpose(_np(sd["input_proj.weight"]), (2, 3, 1, 0)),
        "bias": _np(sd["input_proj.bias"]),
    }
    for i in range(N_LAYERS):
        e = f"transformer.encoder.layers.{i}"
        params[f"enc{i}"] = {
            "self_attn": _mha(sd, e + ".self_attn"),
            "linear1": _linear(sd, e + ".linear1"),
            "linear2": _linear(sd, e + ".linear2"),
            "norm1": _ln(sd, e + ".norm1"),
            "norm2": _ln(sd, e + ".norm2"),
        }
        d = f"transformer.decoder.layers.{i}"
        params[f"dec{i}"] = {
            "self_attn": _mha(sd, d + ".self_attn"),
            "multihead_attn": _mha(sd, d + ".multihead_attn"),
            "linear1": _linear(sd, d + ".linear1"),
            "linear2": _linear(sd, d + ".linear2"),
            "norm1": _ln(sd, d + ".norm1"),
            "norm2": _ln(sd, d + ".norm2"),
            "norm3": _ln(sd, d + ".norm3"),
        }
    params["decoder_norm"] = _ln(sd, "transformer.decoder.norm")
    params["query_embed"] = _np(sd["query_embed.weight"])
    params["class_embed"] = _linear(sd, "class_embed")
    for i in range(3):
        params[f"bbox{i}"] = _linear(sd, f"bbox_embed.layers.{i}")
    return {"params": params, "batch_stats": {"body": body_stats}}


# --------------------------------------------------------------------------
# HICO-DET fine-tuning: 81-class head surgery + set-prediction loss
# (``hicodet/detections/main_detr.py:139-196``)
# --------------------------------------------------------------------------

# COCO-91 logit rows kept by the surgery: 80 object classes + the no-object
# slot (row 91), exactly ``main_detr.py:144-151``.
DETR_SURGERY_KEEP = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90, 91,
]

# HICO-DET object index -> index in the surgered 80-class space
# (``main_detr.py:104-110``; e.g. HICO 49 "person" -> 0).
HICO_TO_DETR80 = [
    4, 47, 24, 46, 34, 35, 21, 59, 13, 1, 14, 8, 73, 39, 45, 50, 5,
    55, 2, 51, 15, 67, 56, 74, 57, 19, 41, 60, 16, 54, 20, 10, 42, 29,
    23, 78, 26, 17, 52, 66, 33, 43, 63, 68, 3, 64, 49, 69, 12, 0, 53,
    58, 72, 65, 48, 76, 18, 71, 36, 30, 31, 44, 32, 11, 28, 37, 77, 38,
    27, 70, 61, 79, 9, 6, 7, 62, 25, 75, 40, 22,
]


def hico_head_surgery(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """80-class head surgery on a COCO-pretrained DETR ``state_dict``.

    Replaces the 92-row ``class_embed`` with the 81 kept rows (80 HICO-valid
    COCO classes + no-object), mirroring ``main_detr.py:141-157``.  The
    returned dict loads with ``load_torch_detr`` into ``DETR(num_classes=80)``.
    """
    sd = dict(state_dict)
    w = _np(sd["class_embed.weight"])
    b = _np(sd["class_embed.bias"])
    sd["class_embed.weight"] = w[DETR_SURGERY_KEEP]
    sd["class_embed.bias"] = b[DETR_SURGERY_KEEP]
    return sd


def detr_match_cost(
    logits: Array,  # [Q, C+1]
    boxes_cxcywh: Array,  # [Q, 4] normalized
    gt_boxes_cxcywh: Array,  # [G, 4] normalized
    gt_labels: Array,  # [G]
    cls_w: float = 1.0,
    l1_w: float = 5.0,
    giou_w: float = 2.0,
) -> Array:
    """DETR's Hungarian cost: -p[label] + L1 + GIoU (matcher.py semantics)."""
    from skghoi_tpu.detect.adamixer import _giou

    p = jax.nn.softmax(logits, axis=-1)
    cls_cost = -p[:, gt_labels]
    l1 = jnp.sum(jnp.abs(boxes_cxcywh[:, None] - gt_boxes_cxcywh[None]), -1)
    giou_cost = -_giou(_cxcywh_to_xyxy(boxes_cxcywh), _cxcywh_to_xyxy(gt_boxes_cxcywh))
    return cls_w * cls_cost + l1_w * l1 + giou_w * giou_cost


def _cxcywh_to_xyxy(b: Array) -> Array:
    cx, cy, w, h = jnp.moveaxis(b, -1, 0)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def detr_set_loss(
    logits: Array,  # [B, Q, C+1]
    boxes_cxcywh: Array,  # [B, Q, 4]
    assignments: Array,  # [B, G] query index per GT (-1 for invalid)
    gt_boxes_cxcywh: Array,  # [B, G, 4]
    gt_labels: Array,  # [B, G]
    gt_valid: Array,  # [B, G]
    eos_coef: float = 0.1,
    l1_w: float = 5.0,
    giou_w: float = 2.0,
) -> dict:
    """DETR criterion: CE over all queries (no-object weighted ``eos_coef``),
    L1 + GIoU over matched pairs, both normalized by the GT count."""
    from skghoi_tpu.detect.adamixer import _giou

    b, q, c1 = logits.shape
    no_object = c1 - 1
    n_gt = jnp.maximum(jnp.sum(gt_valid), 1.0)

    # A valid GT can stay unmatched (assignment == -1) when valid GTs exceed
    # the query count; gate every per-GT term on `matched` so its box loss
    # is not computed against an arbitrary query.
    matched = jnp.logical_and(gt_valid > 0, assignments >= 0)
    # Per-query class target: default no-object, matched queries get the GT
    # label (scatter per image; unmatched GTs scatter out of range -> dropped).
    q_idx = jnp.where(matched, assignments, q)
    target = jnp.full((b, q + 1), no_object)
    target = target.at[jnp.arange(b)[:, None], q_idx].set(
        jnp.where(matched, gt_labels, no_object), mode="drop"
    )[:, :q]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    weight = jnp.where(target == no_object, eos_coef, 1.0)
    cls_loss = jnp.sum(ce * weight) / jnp.sum(weight)

    pb = jnp.take_along_axis(
        boxes_cxcywh, jnp.clip(assignments, 0, q - 1)[..., None], axis=1
    )  # [B, G, 4]
    m = matched[..., None]
    l1 = jnp.sum(jnp.abs(pb - gt_boxes_cxcywh) * m) / n_gt
    giou = jax.vmap(
        lambda p_, g_: jnp.diagonal(_giou(_cxcywh_to_xyxy(p_), _cxcywh_to_xyxy(g_)))
    )(pb, gt_boxes_cxcywh)
    giou_loss = jnp.sum((1.0 - giou) * matched) / n_gt
    return dict(
        ce_loss=cls_loss, l1_loss=l1_w * l1, giou_loss=giou_w * giou_loss
    )


def detr_assignments(logits, boxes_cxcywh, gt_boxes_cxcywh, gt_labels, gt_valid) -> np.ndarray:
    """Host Hungarian per image -> [B, G] query indices (valid GTs first)."""
    from skghoi_tpu.detect.adamixer import hungarian_match

    logits = np.asarray(logits, np.float32)
    boxes = np.asarray(boxes_cxcywh, np.float32)
    out = np.zeros((logits.shape[0], np.asarray(gt_valid).shape[1]), np.int64)
    for bi in range(logits.shape[0]):
        cost = np.asarray(
            detr_match_cost(
                jnp.asarray(logits[bi]), jnp.asarray(boxes[bi]),
                jnp.asarray(gt_boxes_cxcywh[bi]), jnp.asarray(gt_labels[bi]),
            )
        )
        out[bi] = hungarian_match(cost, np.asarray(gt_valid[bi]))
    return out
