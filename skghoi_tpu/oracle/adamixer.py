"""Torch oracle for the AdaMixer adaptive-mixing op (3D sampling + mixing).

Independent plain-torch implementation of the two numerics-critical pieces of
:mod:`skghoi_tpu.detect.adamixer` — the adaptive **3D feature sampling**
(bilinear in space, Gaussian-softmax over pyramid levels) and the adaptive
**channel/spatial mixing** — written in the mmdet/torch idiom (``nn.Linear``
weights ``[out, in]``, ``nn.LayerNorm``) so its ``state_dict`` doubles as the
layout contract for :func:`skghoi_tpu.detect.adamixer_convert.load_torch_mixing`.
``tests/test_adamixer.py`` drives random weights through both and asserts
agreement, the same twin-oracle pattern the stage-2 parity chain uses
(``oracle/twin.py``).

Architecture per the public AdaMixer paper (CVPR 2022); the reference builds
the real thing from an absent mmdet config
(``models/adamixer_transH_spatial_r50_models.py:144-145``).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

LEVEL_LOGS = (2.0, 3.0, 4.0, 5.0)


def sample_3d_torch(pyramid, points, tau: float = 2.0) -> torch.Tensor:
    """pyramid: list of [B, H_l, W_l, C] (NHWC, matching the JAX side);
    points [B, N, G, P, 3] (x, y image pixels; z log2-scale)
    -> [B, N, G, P, C].
    """
    b, n, g, p, _ = points.shape
    flat = points.reshape(b, n * g * p, 3)
    xs, ys, zs = flat[..., 0], flat[..., 1], flat[..., 2]
    logs = torch.tensor(LEVEL_LOGS, dtype=torch.float32)
    wts = F.softmax(-((zs[..., None] - logs) ** 2) / tau, dim=-1)  # [B, M, 4]

    out = None
    for li, feat in enumerate(pyramid):
        stride = 2.0 ** LEVEL_LOGS[li]
        h, w, c = feat.shape[1:]
        xf = xs / stride - 0.5
        yf = ys / stride - 0.5
        x0 = torch.floor(xf)
        y0 = torch.floor(yf)
        wx = (xf - x0)[..., None]
        wy = (yf - y0)[..., None]

        def tap(ix, iy):
            ix = ix.long().clamp(0, w - 1)
            iy = iy.long().clamp(0, h - 1)
            # batched gather: feat[b, iy, ix] per batch row
            idx = iy * w + ix  # [B, M]
            fl = feat.reshape(b, h * w, c)
            return torch.gather(fl, 1, idx[..., None].expand(-1, -1, c))

        v00 = tap(x0, y0)
        v01 = tap(x0 + 1, y0)
        v10 = tap(x0, y0 + 1)
        v11 = tap(x0 + 1, y0 + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        sampled = top * (1 - wy) + bot * wy  # [B, M, C]
        term = sampled * wts[..., li : li + 1]
        out = term if out is None else out + term
    return out.reshape(b, n, g, p, -1)


class AdaptiveMixingTorch(nn.Module):
    """Twin of :class:`skghoi_tpu.detect.adamixer.AdaptiveMixing`.

    Submodule names define the state-dict layout the converter maps:
    ``channel_mixer`` / ``spatial_mixer`` (weight generators), ``ln_c`` /
    ``ln_s`` (LayerNorms over C/G), ``out_proj``.
    """

    def __init__(self, content_dim: int, groups: int = 4, in_points: int = 32,
                 out_points: int = 128):
        super().__init__()
        self.content_dim = content_dim
        self.groups = groups
        self.in_points = in_points
        self.out_points = out_points
        cg = content_dim // groups
        self.channel_mixer = nn.Linear(content_dim, groups * cg * cg)
        self.spatial_mixer = nn.Linear(content_dim, groups * out_points * in_points)
        self.ln_c = nn.LayerNorm(cg)
        self.ln_s = nn.LayerNorm(cg)
        self.out_proj = nn.Linear(groups * out_points * cg, content_dim)

    def forward(self, query: torch.Tensor, values: torch.Tensor) -> torch.Tensor:
        b, n, g, p_in, cg = values.shape
        m_c = self.channel_mixer(query).reshape(b, n, g, cg, cg)
        m_s = self.spatial_mixer(query).reshape(b, n, g, self.out_points, p_in)
        out = torch.einsum("bngpc,bngcd->bngpd", values, m_c)
        out = F.relu(self.ln_c(out))
        out = torch.einsum("bngop,bngpc->bngoc", m_s, out)
        out = F.relu(self.ln_s(out))
        return self.out_proj(out.reshape(b, n, -1))


def xyzr_to_box_torch(xyzr: torch.Tensor) -> torch.Tensor:
    x, y, z, r = xyzr.unbind(-1)
    w = 2.0 ** (z - 0.5 * r)
    h = 2.0 ** (z + 0.5 * r)
    return torch.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], dim=-1)
