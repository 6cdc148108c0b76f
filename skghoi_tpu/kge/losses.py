"""KGE training losses: margin / sigmoid / softplus, with self-adversarial option.

Semantics mirror ``OpenKE/openke/module/loss/*``:

- ``MarginLoss(margin)``: ``max(p - n, -margin).mean() + margin``; with
  ``adv_temperature`` the negatives are weighted by
  ``softmax(-n * T)`` (detached) before summing over the negative axis.
- ``SigmoidLoss``: ``-(logsigmoid(p).mean() + logsigmoid(-n).mean()) / 2``;
  adversarial variant weights ``logsigmoid(-n)`` by ``softmax(n * T)``.
- ``SoftplusLoss``: ``(softplus(-p).mean() + softplus(n).mean()) / 2`` with the
  analogous adversarial weighting.

``p_score`` is ``[B, 1]`` (or ``[B]``), ``n_score`` ``[B, K]``; both are plain
callables so they can live inside a jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class MarginLoss:
    margin: float = 6.0
    adv_temperature: Optional[float] = None

    def __call__(self, p_score: Array, n_score: Array) -> Array:
        if self.adv_temperature is not None:
            w = jax.lax.stop_gradient(jax.nn.softmax(-n_score * self.adv_temperature, axis=-1))
            return (
                jnp.sum(w * jnp.maximum(p_score - n_score, -self.margin), axis=-1).mean()
                + self.margin
            )
        return jnp.maximum(p_score - n_score, -self.margin).mean() + self.margin


@dataclass(frozen=True)
class SigmoidLoss:
    adv_temperature: Optional[float] = None

    def __call__(self, p_score: Array, n_score: Array) -> Array:
        pos = jax.nn.log_sigmoid(p_score).mean()
        if self.adv_temperature is not None:
            w = jax.lax.stop_gradient(jax.nn.softmax(n_score * self.adv_temperature, axis=-1))
            neg = jnp.sum(w * jax.nn.log_sigmoid(-n_score), axis=-1).mean()
        else:
            neg = jax.nn.log_sigmoid(-n_score).mean()
        return -(pos + neg) / 2


@dataclass(frozen=True)
class SoftplusLoss:
    adv_temperature: Optional[float] = None

    def __call__(self, p_score: Array, n_score: Array) -> Array:
        pos = jax.nn.softplus(-p_score).mean()
        if self.adv_temperature is not None:
            w = jax.lax.stop_gradient(jax.nn.softmax(n_score * self.adv_temperature, axis=-1))
            neg = jnp.sum(w * jax.nn.softplus(n_score), axis=-1).mean()
        else:
            neg = jax.nn.softplus(n_score).mean()
        return (pos + neg) / 2
