"""The space-to-depth stem is bit-for-bit the 7x7/2 convolution.

The TPU stem transform (``models/resnet.py::StemConv``) re-indexes the 7x7
stride-2 kernel into a 4x4 stride-1 kernel over 2x2 space-to-depth input;
both formulations sum exactly the same products, so in float32 they must
agree to reordering tolerance on arbitrary inputs, including the padded
borders where the zero-weight former ``t = -1`` taps sit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skghoi_tpu.models.resnet import StemConv


def _plain(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("impl", ["conv", "im2col"])
@pytest.mark.parametrize("hw", [(64, 96), (50, 70), (8, 8)])
def test_s2d_stem_equals_plain_conv(hw, impl):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3)), jnp.float32)
    stem = StemConv(space_to_depth=True, impl=impl)
    variables = stem.init(jax.random.PRNGKey(0), x)
    got = stem.apply(variables, x)
    want = _plain(x, variables["params"]["kernel"])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_im2col_stem_grad_matches_conv():
    """The im2col path must also back-propagate identically (the stem trains
    whenever frozen_stages < 0)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    stems = {impl: StemConv(space_to_depth=True, impl=impl) for impl in ("conv", "im2col")}
    variables = stems["conv"].init(jax.random.PRNGKey(0), x)

    grads = {}
    for impl, stem in stems.items():
        g = jax.grad(lambda v: jnp.sum(stem.apply(v, x) ** 2))(variables)
        grads[impl] = np.asarray(g["params"]["kernel"])
    np.testing.assert_allclose(grads["im2col"], grads["conv"], rtol=1e-4, atol=1e-4)


def test_s2d_falls_back_on_odd_sizes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 63, 97, 3)), jnp.float32)
    stem = StemConv(space_to_depth=True)
    variables = stem.init(jax.random.PRNGKey(0), x)
    got = stem.apply(variables, x)
    want = _plain(x, variables["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
