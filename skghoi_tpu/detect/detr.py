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
    """DETR-R50 inference: images -> per-query (box, label, score)."""

    num_classes: int = 91  # COCO id space; logits have +1 no-object slot
    dtype: Any = jnp.float32

    def setup(self):
        self.body = ResNet50(dtype=self.dtype)
        self.input_proj = nn.Conv(D_MODEL, (1, 1), name="input_proj", dtype=self.dtype)
        self.encoder = [EncoderLayer(name=f"enc{i}") for i in range(N_LAYERS)]
        self.decoder = [DecoderLayer(name=f"dec{i}") for i in range(N_LAYERS)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (N_QUERIES, D_MODEL)
        )
        self.class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        self.bbox_mlp = [
            nn.Dense(D_MODEL, name="bbox0"),
            nn.Dense(D_MODEL, name="bbox1"),
            nn.Dense(4, name="bbox2"),
        ]

    def __call__(self, images: Array, image_sizes: Array) -> DETRDetections:
        """``images`` [B, H, W, 3] normalized; ``image_sizes`` [B, 2] (h, w)
        original sizes the boxes are scaled to (``PostProcess`` semantics)."""
        c5 = self.body(images)[-1]
        feat = self.input_proj(c5.astype(self.dtype))
        b, fh, fw, _ = feat.shape
        pos = jnp.asarray(sine_position_embedding(fh, fw)).reshape(1, fh * fw, D_MODEL)
        src = feat.reshape(b, fh * fw, D_MODEL)

        x = src
        for layer in self.encoder:
            x = layer(x, pos)
        memory = x

        query_pos = jnp.broadcast_to(self.query_embed[None], (b, N_QUERIES, D_MODEL))
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
