"""AdaMixer query-based detector (decoder + set-prediction loss) in Flax.

The reference's stage 1 *is* an AdaMixer-R50 built from an mmdet config
(``models/adamixer_transH_spatial_r50_models.py:144-157``; detection-cache
generation ``hicodet/detections/adamixer_preprocessing.py:43-58``).  The
config/checkpoint are hard-coded absent cluster paths, but the architecture
is public (AdaMixer: A Fast-Converging Query-Based Object Detector,
CVPR 2022): a query-based decoder over multi-scale features, where each
query carries a content vector and a positional ``(x, y, z, r)`` box
parameterization and each decoder stage

1. runs position-aware multi-head self-attention across queries,
2. samples ``G x P_in`` points from the feature pyramid at query-relative
   offsets — the *3D* part: each point has a continuous scale coordinate
   ``z`` and its value interpolates bilinearly in space and with Gaussian
   softmax weights across pyramid levels,
3. mixes the sampled values with query-generated weights: adaptive
   *channel* mixing (a per-group ``C/G x C/G`` matmul) then adaptive
   *spatial* mixing (a ``P_out x P_in`` matmul over the point axis),
4. feeds an FFN and predicts a class score and an ``(dx, dy, dz, dr)``
   box update.

TPU-first design: everything is fixed-shape and batched — the sampling is
one gather + weighted sum over the 4 levels, the mixing matrices for all
queries form ``[B, N, G, ., .]`` tensors contracted with ``einsum`` (MXU),
and the whole decoder jits as a single program.  Hungarian matching (the
only data-dependent step of the DETR-family loss) runs on host between
jitted cost and loss computations, mirroring how the reference family
(``main_detr.py``) structures set-prediction training.

Hyper-parameters follow the paper's R50 configuration: 100 queries, 6
stages, content dim 256, 4 groups, 32 in-points, 128 out-points, FFN 2048,
focal classification (alpha .25, gamma 2) with DETR cost weights
(cls 2, L1 5, GIoU 2).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu import constants as C
from skghoi_tpu.models.backbone import DetectorBackbone

Array = jax.Array

# Pyramid levels are indexed by log2(stride): our FPN emits strides 4..32.
LEVEL_LOGS = (2.0, 3.0, 4.0, 5.0)


# ---------------------------------------------------------------------------
# (x, y, z, r) box parameterization.  z = log2(sqrt(w*h)), r = log2(h/w):
#   w = 2^(z - r/2),  h = 2^(z + r/2).
# ---------------------------------------------------------------------------

def xyzr_to_box(xyzr: Array) -> Array:
    """[..., 4] (x, y, z, r) -> [..., 4] (x1, y1, x2, y2)."""
    x, y, z, r = jnp.moveaxis(xyzr, -1, 0)
    w = 2.0 ** (z - 0.5 * r)
    h = 2.0 ** (z + 0.5 * r)
    return jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], axis=-1)


def box_to_xyzr(boxes: Array) -> Array:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-4)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-4)
    x = (boxes[..., 0] + boxes[..., 2]) / 2
    y = (boxes[..., 1] + boxes[..., 3]) / 2
    z = jnp.log2(jnp.sqrt(w * h))
    r = jnp.log2(h / w)
    return jnp.stack([x, y, z, r], axis=-1)


def apply_deltas(xyzr: Array, deltas: Array) -> Array:
    """Refine: x/y move in units of box width/height, z/r additively."""
    x, y, z, r = jnp.moveaxis(xyzr, -1, 0)
    dx, dy, dz, dr = jnp.moveaxis(deltas, -1, 0)
    w = 2.0 ** (z - 0.5 * r)
    h = 2.0 ** (z + 0.5 * r)
    return jnp.stack([x + dx * w, y + dy * h, z + dz, r + dr], axis=-1)


def position_embedding(xyzr: Array, dim: int, temperature: float = 10000.0) -> Array:
    """Sinusoidal embedding of each of the 4 query-box coordinates."""
    per = dim // 4
    freq = temperature ** (jnp.arange(per // 2, dtype=jnp.float32) / (per // 2))
    ang = xyzr[..., :, None] / freq  # [..., 4, per/2]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., 4, per]
    return emb.reshape(*xyzr.shape[:-1], 4 * per)


# ---------------------------------------------------------------------------
# Adaptive 3D feature sampling
# ---------------------------------------------------------------------------

def _bilinear_sample(feat: Array, x: Array, y: Array) -> Array:
    """Sample one level.  feat [H, W, C]; x/y [P] in *pixel* units of that
    level's grid (align_corners=False convention: pixel centers at +0.5).
    Out-of-bounds taps clamp (border padding)."""
    h, w, _ = feat.shape
    xf = x - 0.5
    yf = y - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    wx = xf - x0
    wy = yf - y0

    def tap(ix, iy):
        ix = jnp.clip(ix.astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(iy.astype(jnp.int32), 0, h - 1)
        return feat[iy, ix]  # [P, C]

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    wx = wx[:, None]
    wy = wy[:, None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_3d(
    pyramid: Sequence[Array],  # 4 levels, [B, H_l, W_l, C], strides 4..32
    points: Array,  # [B, N, G, P, 3] (x, y in image pixels; z in log2-stride)
    tau: float = 2.0,
) -> Array:
    """-> [B, N, G, P, C] interpolated feature values.

    Spatial: bilinear inside each level.  Scale: Gaussian softmax over the
    4 levels, ``w_l = softmax_l(-(z - z_l)^2 / tau)`` — the paper's soft
    interpolation over the scale axis (a point between two pyramid levels
    reads a weighted blend of both).
    """
    b, n, g, p, _ = points.shape
    flat = points.reshape(b, n * g * p, 3)
    xs, ys, zs = flat[..., 0], flat[..., 1], flat[..., 2]
    logs = jnp.asarray(LEVEL_LOGS, jnp.float32)
    wts = jax.nn.softmax(-((zs[..., None] - logs) ** 2) / tau, axis=-1)  # [B, M, 4]

    out = None
    for li, feat in enumerate(pyramid):
        stride = 2.0 ** LEVEL_LOGS[li]
        sampled = jax.vmap(_bilinear_sample)(
            feat, xs / stride, ys / stride
        )  # [B, M, C]
        term = sampled * wts[..., li : li + 1].astype(sampled.dtype)
        out = term if out is None else out + term
    return out.reshape(b, n, g, p, -1)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class AdaptiveMixing(nn.Module):
    """Query-generated channel + spatial mixing of sampled values.

    values [B, N, G, P_in, C/G] -> [B, N, C] (output projection included).
    """

    content_dim: int
    groups: int = 4
    in_points: int = 32
    out_points: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: Array, values: Array) -> Array:
        b, n, g, p_in, cg = values.shape
        assert g == self.groups and p_in == self.in_points
        # Mixing weights are query-specific.  The generator *kernel* is
        # zero-init (stage starts as identity-ish refinement, the
        # SparseRCNN/AdaMixer convention) but the *bias* must be nonzero:
        # with both at zero the mixing matrices are identically zero and
        # relu(LayerNorm(0)) = 0 kills every gradient through the block
        # forever.  The official AdaMixer keeps torch Linear's default bias
        # (uniform ±1/sqrt(fan_in)); replicate that here (flax Dense's
        # default bias_init is zeros, unlike torch).
        bound = 1.0 / float(np.sqrt(query.shape[-1]))

        def _torch_bias(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        m_c = nn.Dense(g * cg * cg, kernel_init=nn.initializers.zeros,
                       bias_init=_torch_bias,
                       dtype=self.dtype, name="channel_mixer")(query)
        m_s = nn.Dense(g * self.out_points * p_in, kernel_init=nn.initializers.zeros,
                       bias_init=_torch_bias,
                       dtype=self.dtype, name="spatial_mixer")(query)
        m_c = m_c.reshape(b, n, g, cg, cg)
        m_s = m_s.reshape(b, n, g, self.out_points, p_in)

        # Channel mixing: per-group [P_in, C/G] @ [C/G, C/G]
        out = jnp.einsum("bngpc,bngcd->bngpd", values, m_c)
        out = nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln_c")(out))
        # Spatial mixing: [P_out, P_in] @ [P_in, C/G]
        out = jnp.einsum("bngop,bngpc->bngoc", m_s, out)
        out = nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln_s")(out))

        out = out.reshape(b, n, g * self.out_points * cg)
        return nn.Dense(self.content_dim, dtype=self.dtype, name="out_proj")(out)


class AdaMixerStage(nn.Module):
    num_classes: int
    content_dim: int = 256
    num_heads: int = 8
    groups: int = 4
    in_points: int = 32
    out_points: int = 128
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, query: Array, xyzr: Array):
        """-> (new_query, new_xyzr, cls_logits [B, N, K])."""
        b, n, _ = query.shape

        # 1. Position-aware self-attention (DETR convention: positional
        # embedding enters q/k, not v).
        pe = position_embedding(xyzr, self.content_dim)
        pe = nn.Dense(self.content_dim, dtype=self.dtype, name="pos_proj")(pe)
        qk = query + pe
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(qk, qk, query)
        query = nn.LayerNorm(dtype=self.dtype, name="ln_attn")(query + attn)

        # 2. Adaptive 3D sampling: offsets are query-generated, scaled by the
        # query box (dx in widths, dy in heights, dz in octaves).
        off = nn.Dense(
            self.groups * self.in_points * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=_initial_offsets(self.groups, self.in_points),
            dtype=self.dtype, name="offset_generator",
        )(query).reshape(b, n, self.groups, self.in_points, 3)
        x, y, z, r = jnp.moveaxis(xyzr, -1, 0)
        w = 2.0 ** (z - 0.5 * r)
        h = 2.0 ** (z + 0.5 * r)
        base = jnp.stack([x, y, z], axis=-1)[:, :, None, None, :]
        scale = jnp.stack([w, h, jnp.ones_like(z)], axis=-1)[:, :, None, None, :]
        points = base + off.astype(jnp.float32) * scale

        # Each sampling group owns a C/G channel slice of the pyramid and its
        # own offsets; sample each slice at its group's points.
        cg = self.content_dim // self.groups
        vals = []
        for gi in range(self.groups):
            level_slice = [f[..., gi * cg : (gi + 1) * cg] for f in pyramid]
            vals.append(sample_3d(level_slice, points[:, :, gi : gi + 1]))
        values = jnp.concatenate(vals, axis=2)  # [B, N, G, P_in, C/G]

        mixed = AdaptiveMixing(
            content_dim=self.content_dim, groups=self.groups,
            in_points=self.in_points, out_points=self.out_points,
            dtype=self.dtype, name="adaptive_mixing",
        )(query, values)
        query = nn.LayerNorm(dtype=self.dtype, name="ln_mix")(query + mixed)

        # 3. FFN
        ff = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(query)
        ff = nn.Dense(self.content_dim, dtype=self.dtype, name="ffn2")(nn.relu(ff))
        query = nn.LayerNorm(dtype=self.dtype, name="ln_ffn")(query + ff)

        # 4. Heads.  Class bias at focal prior; box delta zero-init so the
        # stage starts from the incoming box.
        cls_logits = nn.Dense(
            self.num_classes, bias_init=nn.initializers.constant(-4.595),
            dtype=self.dtype, name="fc_cls",
        )(query)
        reg = query
        for i in range(2):
            reg = nn.relu(nn.Dense(self.content_dim, dtype=self.dtype, name=f"reg_fc{i}")(reg))
        deltas = nn.Dense(4, kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="fc_reg")(reg)
        xyzr = apply_deltas(xyzr, deltas.astype(jnp.float32))
        return query, xyzr, cls_logits.astype(jnp.float32)


def _initial_offsets(groups: int, in_points: int):
    """Bias init: points start as a small grid around the box center (the
    zero-weight offset generator then learns query-dependent deviations)."""

    def init(key, shape, dtype=jnp.float32):
        side = int(np.ceil(np.sqrt(in_points)))
        xs, ys = np.meshgrid(np.linspace(-0.25, 0.25, side), np.linspace(-0.25, 0.25, side))
        pts = np.stack([xs.ravel(), ys.ravel()], -1)[:in_points]
        out = np.zeros((groups, in_points, 3), np.float32)
        out[:, :, :2] = pts
        return jnp.asarray(out.reshape(-1), dtype)

    return init


class AdaMixerOutputs(NamedTuple):
    cls_logits: Array  # [S, B, N, K] per stage
    boxes: Array  # [S, B, N, 4] per stage (x1y1x2y2, image pixels)


class AdaMixerDecoder(nn.Module):
    num_classes: int = C.HICO_NUM_OBJECTS
    num_queries: int = 100
    num_stages: int = 6
    content_dim: int = 256
    groups: int = 4
    in_points: int = 32
    out_points: int = 128
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, image_hw: Tuple[float, float]) -> AdaMixerOutputs:
        b = pyramid[0].shape[0]
        ih, iw = image_hw

        # Learned initial content; initial boxes tile the whole image (the
        # paper initializes queries to cover the input).
        content = self.param(
            "init_content_features",
            nn.initializers.normal(0.02),
            (self.num_queries, self.content_dim),
        )
        query = jnp.broadcast_to(
            content.astype(self.dtype), (b, self.num_queries, self.content_dim)
        )
        init_box = jnp.asarray([0.0, 0.0, float(iw), float(ih)])
        xyzr = jnp.broadcast_to(
            box_to_xyzr(init_box), (b, self.num_queries, 4)
        )

        # ChannelMapper role (the official AdaMixer's neck): bring each level
        # to content_dim channels so the G sampling groups slice C/G each.
        if pyramid[0].shape[-1] != self.content_dim:
            pyramid = [
                nn.Dense(self.content_dim, dtype=self.dtype, name=f"level_proj{i}")(f)
                for i, f in enumerate(pyramid)
            ]

        all_logits, all_boxes = [], []
        for s in range(self.num_stages):
            query, xyzr, logits = AdaMixerStage(
                num_classes=self.num_classes, content_dim=self.content_dim,
                groups=self.groups, in_points=self.in_points,
                out_points=self.out_points, ffn_dim=self.ffn_dim,
                dtype=self.dtype, name=f"stage{s}",
            )(pyramid, query, xyzr)
            all_logits.append(logits)
            all_boxes.append(xyzr_to_box(xyzr))
        return AdaMixerOutputs(jnp.stack(all_logits), jnp.stack(all_boxes))


class AdaMixerDetector(nn.Module):
    """Backbone + FPN + AdaMixer decoder (the reference's stage-1 detector)."""

    num_classes: int = C.HICO_NUM_OBJECTS
    num_queries: int = 100
    num_stages: int = 6
    content_dim: int = 256
    groups: int = 4
    in_points: int = 32
    out_points: int = 128
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = DetectorBackbone(dtype=self.dtype)
        self.decoder = AdaMixerDecoder(
            num_classes=self.num_classes, num_queries=self.num_queries,
            num_stages=self.num_stages, content_dim=self.content_dim,
            groups=self.groups, in_points=self.in_points,
            out_points=self.out_points, ffn_dim=self.ffn_dim, dtype=self.dtype,
        )

    def __call__(self, images: Array) -> AdaMixerOutputs:
        mean = jnp.asarray(C.IMAGE_MEAN, self.dtype)
        std = jnp.asarray(C.IMAGE_STD, self.dtype)
        pyramid = self.backbone((images.astype(self.dtype) - mean) / std)
        return self.decoder(pyramid, images.shape[1:3])


# ---------------------------------------------------------------------------
# Set-prediction loss (DETR family): Hungarian matching on host, jitted loss.
# ---------------------------------------------------------------------------

def _giou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise GIoU [N, M]."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)
    lt_h = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb_h = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh_h = jnp.clip(rb_h - lt_h, 0)
    hull = jnp.maximum(wh_h[..., 0] * wh_h[..., 1], 1e-6)
    return iou - (hull - union) / hull


def match_cost(
    cls_logits: Array,  # [N, K]
    boxes: Array,  # [N, 4] pixels
    gt_boxes: Array,  # [G, 4]
    gt_labels: Array,  # [G]
    image_hw: Tuple[float, float],
    cls_w: float = 2.0,
    l1_w: float = 5.0,
    giou_w: float = 2.0,
) -> Array:
    """[N, G] DETR cost matrix (focal cls cost + normalized L1 + GIoU)."""
    ih, iw = image_hw
    scale = jnp.asarray([iw, ih, iw, ih], jnp.float32)
    p = jax.nn.sigmoid(cls_logits)
    alpha, gamma = 0.25, 2.0
    pos_cost = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    neg_cost = (1 - alpha) * (p**gamma) * (-jnp.log(1 - p + 1e-8))
    cls_cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]
    l1 = jnp.sum(jnp.abs(boxes[:, None] / scale - gt_boxes[None] / scale), -1)
    giou_cost = -_giou(boxes, gt_boxes)
    return cls_w * cls_cost + l1_w * l1 + giou_w * giou_cost


def hungarian_match(cost: np.ndarray, gt_valid: np.ndarray) -> np.ndarray:
    """Host-side matching.  Returns per-GT query index (-1 for invalid GTs)."""
    from scipy.optimize import linear_sum_assignment

    idx = np.flatnonzero(gt_valid)  # no contiguous-prefix assumption
    out = np.full(cost.shape[1], -1, np.int64)
    if idx.size:
        rows, cols = linear_sum_assignment(cost[:, idx])
        out[idx[cols]] = rows
    return out


def set_loss(
    outputs: AdaMixerOutputs,
    assignments: Array,  # [S, B, G] query index per GT (host-matched), -1 pad
    gt_boxes: Array,  # [B, G, 4]
    gt_labels: Array,  # [B, G]
    gt_valid: Array,  # [B, G]
    image_hw: Tuple[float, float],
    cls_w: float = 2.0,
    l1_w: float = 5.0,
    giou_w: float = 2.0,
) -> dict:
    """Per-stage focal + L1 + GIoU, averaged over stages, / num GT."""
    from skghoi_tpu.ops.losses import binary_focal_loss_with_logits

    s, b, n, k = outputs.cls_logits.shape
    ih, iw = image_hw
    scale = jnp.asarray([iw, ih, iw, ih], jnp.float32)
    n_gt = jnp.maximum(jnp.sum(gt_valid), 1.0)

    def stage_loss(logits, boxes, assign):
        # A valid GT can stay unmatched (assign == -1) when valid GTs exceed
        # num_queries; its box loss must not be computed against an
        # arbitrary query, so every per-GT term is gated on `matched`.
        matched = jnp.logical_and(gt_valid > 0, assign >= 0)
        # Build per-query class targets from the assignment.
        q_idx = jnp.where(matched, assign, n)  # unmatched -> out-of-range
        cls_t = jnp.zeros((b, n + 1, k))
        cls_t = cls_t.at[
            jnp.arange(b)[:, None], q_idx, gt_labels
        ].max(jnp.where(matched, 1.0, 0.0))
        cls_t = cls_t[:, :n]
        cls_loss = binary_focal_loss_with_logits(
            logits, cls_t, alpha=0.25, gamma=2.0, reduction="sum"
        ) / n_gt

        pb = jnp.take_along_axis(
            boxes, jnp.clip(assign, 0, n - 1)[..., None], axis=1
        )  # [B, G, 4]
        m = matched[..., None]
        l1 = jnp.sum(jnp.abs(pb / scale - gt_boxes / scale) * m) / n_gt
        giou = jax.vmap(lambda p_, g_: jnp.diagonal(_giou(p_, g_)))(pb, gt_boxes)
        giou_loss = jnp.sum((1.0 - giou) * matched) / n_gt
        return cls_w * cls_loss + l1_w * l1 + giou_w * giou_loss

    total = 0.0
    for si in range(s):
        total = total + stage_loss(
            outputs.cls_logits[si], outputs.boxes[si], assignments[si]
        )
    return dict(set_loss=total / s)


def compute_assignments(
    outputs: AdaMixerOutputs, gt_boxes, gt_labels, gt_valid, image_hw
) -> np.ndarray:
    """Host loop: Hungarian per (stage, image).  [S, B, G] int array."""
    logits = np.asarray(outputs.cls_logits, np.float32)
    boxes = np.asarray(outputs.boxes, np.float32)
    gt_boxes = np.asarray(gt_boxes)
    gt_labels = np.asarray(gt_labels)
    gt_valid = np.asarray(gt_valid)
    s, b, _, _ = logits.shape
    out = np.zeros((s, b, gt_boxes.shape[1]), np.int64)
    for si in range(s):
        for bi in range(b):
            cost = np.asarray(
                match_cost(
                    jnp.asarray(logits[si, bi]), jnp.asarray(boxes[si, bi]),
                    jnp.asarray(gt_boxes[bi]), jnp.asarray(gt_labels[bi]), image_hw,
                )
            )
            out[si, bi] = hungarian_match(cost, gt_valid[bi])
    return out
