"""Feature Pyramid Network neck producing P2..P5 at 256 channels.

Replaces the reference's ``detector_neck`` (mmdet FPN inside the AdaMixer
detector, consumed as feature maps '0'..'3' by
``models/adamixer_transH_spatial_r50_models.py:97-101``).  Standard FPN:
lateral 1x1 projections, nearest-neighbour top-down accumulation, 3x3 output
convs.  All shapes are static given the input canvas, so the whole neck is one
fused XLA region.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _upsample_nearest_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> Tuple[Array, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(features)
        ]
        # Top-down pathway (coarsest first).
        for i in range(len(laterals) - 2, -1, -1):
            laterals[i] = laterals[i] + _upsample_nearest_2x(laterals[i + 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"output{i}")(l)
            for i, l in enumerate(laterals)
        ]
        return tuple(outs)
