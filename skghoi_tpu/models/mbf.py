"""Multi-branch fusion (MBF) as a single batched einsum over the branch axis.

The reference implements cardinality-16 MBF as 3 x 16 separate ``nn.Linear``
modules applied in a Python loop and summed
(``heads/adamixer_transH_spatial_r50_head.py:431-530``):

    out = relu( sum_k fc3_k( relu( fc1_k(app) * fc2_k(spatial) ) ) )

Its ``MessageMBF`` subclasses only differ in how the appearance tensor is
broadcast across the pair grid (human nodes repeat over objects and vice
versa, ``:509-527``).  With batched ``[..., feature]`` tensors plain
broadcasting covers both variants, so one module suffices — and stacking the
16 branches into one ``[K, in, sub]`` weight turns the whole thing into two
``einsum`` contractions that tile straight onto the MXU instead of 48 small
GEMMs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _linear_init(fan_in: int):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MultiBranchFusion(nn.Module):
    """``final_relu=True`` is the reference ``MultiBranchFusion`` (``:469-474``,
    outer ReLU); ``final_relu=False`` is ``MessageMBF`` (``:509-527``), whose
    branch sum is returned raw — the ReLU there happens only after the
    adjacency weighting (``:909-922``)."""

    appearance_size: int
    spatial_size: int
    representation_size: int
    cardinality: int = 16
    final_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, appearance: Array, spatial: Array) -> Array:
        k = self.cardinality
        sub = self.representation_size // k
        assert sub * k == self.representation_size, (
            "The given representation size should be divisible by cardinality"
        )
        w1 = self.param("w1", _linear_init(self.appearance_size), (k, self.appearance_size, sub))
        b1 = self.param("b1", _linear_init(self.appearance_size), (k, sub))
        w2 = self.param("w2", _linear_init(self.spatial_size), (k, self.spatial_size, sub))
        b2 = self.param("b2", _linear_init(self.spatial_size), (k, sub))
        w3 = self.param("w3", _linear_init(sub), (k, sub, self.representation_size))
        b3 = self.param("b3", _linear_init(sub), (k, self.representation_size))

        appearance = appearance.astype(self.dtype)
        spatial = spatial.astype(self.dtype)
        a = jnp.einsum("...i,kis->...ks", appearance, w1.astype(self.dtype)) + b1.astype(self.dtype)
        s = jnp.einsum("...i,kis->...ks", spatial, w2.astype(self.dtype)) + b2.astype(self.dtype)
        h = nn.relu(a * s)
        # Sum over branches commutes with the per-branch output projections;
        # the 16 biases collapse into one.
        out = jnp.einsum("...ks,ksr->...r", h, w3.astype(self.dtype)) + jnp.sum(
            b3, axis=0
        ).astype(self.dtype)
        return nn.relu(out) if self.final_relu else out
