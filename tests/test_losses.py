"""Loss functions vs direct formula evaluation (torch-CPU as BCE oracle)."""

import numpy as np
import jax.numpy as jnp
import torch

from skghoi_tpu.ops import (
    binary_focal_loss,
    binary_focal_loss_with_logits,
    margin_ranking_loss,
)


def torch_focal(x, y, alpha=0.5, gamma=2.0, eps=1e-6):
    """Reference formula: |1-y-a| * (|y-x|+eps)^g * BCE(x, y) (ops.py:200-203)."""
    x = torch.as_tensor(x, dtype=torch.float64)
    y = torch.as_tensor(y, dtype=torch.float64)
    bce = torch.nn.functional.binary_cross_entropy(x, y, reduction="none")
    return ((1 - y - alpha).abs() * ((y - x).abs() + eps) ** gamma * bce).numpy()


def test_focal_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.01, 0.99, (64, 117)).astype(np.float32)
    y = (rng.uniform(size=(64, 117)) < 0.1).astype(np.float32)
    for gamma in (0.2, 2.0):
        got = np.asarray(
            binary_focal_loss(jnp.asarray(x), jnp.asarray(y), gamma=gamma, reduction="none")
        )
        np.testing.assert_allclose(got, torch_focal(x, y, gamma=gamma), rtol=1e-3, atol=1e-6)


def test_logits_version_matches_probability_version():
    rng = np.random.default_rng(1)
    z = rng.normal(0, 3, (32, 117)).astype(np.float32)
    y = (rng.uniform(size=(32, 117)) < 0.2).astype(np.float32)
    a = binary_focal_loss(jnp.asarray(1 / (1 + np.exp(-z))), jnp.asarray(y), gamma=0.2, reduction="none")
    b = binary_focal_loss_with_logits(jnp.asarray(z), jnp.asarray(y), gamma=0.2, reduction="none")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6)


def test_logits_version_stable_at_extreme_logits():
    z = jnp.asarray([[-80.0, 80.0]])
    y = jnp.asarray([[1.0, 0.0]])
    out = binary_focal_loss_with_logits(z, y, gamma=0.2, reduction="none")
    assert bool(jnp.all(jnp.isfinite(out)))


def test_masked_sum_reduction():
    x = jnp.asarray([0.3, 0.8, 0.5])
    y = jnp.asarray([1.0, 0.0, 1.0])
    mask = jnp.asarray([True, True, False])
    full = binary_focal_loss(x, y, reduction="none")
    got = binary_focal_loss(x, y, reduction="sum", mask=mask)
    np.testing.assert_allclose(float(got), float(full[0] + full[1]), rtol=1e-6)


def test_margin_ranking_loss_reference_semantics():
    # MarginLoss.forward (margin=1): max(p - n, -margin).mean() + margin
    p = jnp.asarray([0.5, 3.0, 0.1])
    n = jnp.asarray([2.0, 1.0, 0.2])
    raw = np.maximum(np.asarray(p) - np.asarray(n), -1.0)
    want = raw.mean() + 1.0
    np.testing.assert_allclose(float(margin_ranking_loss(p, n, margin=1.0)), want, rtol=1e-6)


def test_margin_ranking_loss_empty_mask_is_zero():
    p = jnp.zeros(4)
    n = jnp.zeros(4)
    mask = jnp.zeros(4, bool)
    assert float(margin_ranking_loss(p, n, margin=1.0, mask=mask)) == 0.0
