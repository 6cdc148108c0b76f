"""Negative-sampling training strategy (OpenKE ``strategy/NegativeSampling.py``).

Combines a model's scores on one positive + K negatives per example with a
ranking loss, plus optional L2 / L3 regularization.  Where OpenKE splits one
flattened score buffer into positive/negative halves
(``NegativeSampling.py:18-25``), here the batch is structured
(:class:`~skghoi_tpu.kge.sampling.TripleBatch`), so the split is explicit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from skghoi_tpu.kge.sampling import CorruptBatch, TripleBatch

Array = jax.Array


@dataclass(frozen=True)
class NegativeSampling:
    """loss_fn(p_score [B, 1], n_score [B, K]) plus regularization hooks."""

    loss: Callable[[Array, Array], Array]
    regul_rate: float = 0.0
    l3_regul_rate: float = 0.0

    def __call__(self, model, params, batch) -> Array:
        p_score = model.apply(params, batch.pos_h, batch.pos_t, batch.pos_r)[:, None]
        if isinstance(batch, CorruptBatch):
            n_score = model.apply(
                params, batch.pos_h, batch.pos_t, batch.pos_r,
                batch.neg_ent, batch.corrupt_tail, method="score_one_side",
            )
            ct = batch.corrupt_tail[:, None]
            neg_h = jnp.where(ct, batch.pos_h[:, None], batch.neg_ent)
            neg_t = jnp.where(ct, batch.neg_ent, batch.pos_t[:, None])
            neg_r = jnp.broadcast_to(batch.pos_r[:, None], batch.neg_ent.shape)
        else:
            n_score = model.apply(params, batch.neg_h, batch.neg_t, batch.neg_r)
            neg_h, neg_t, neg_r = batch.neg_h, batch.neg_t, batch.neg_r
        loss = self.loss(p_score, n_score)
        if self.regul_rate != 0.0:
            h = jnp.concatenate([batch.pos_h, neg_h.reshape(-1)])
            t = jnp.concatenate([batch.pos_t, neg_t.reshape(-1)])
            r = jnp.concatenate([batch.pos_r, neg_r.reshape(-1)])
            loss = loss + self.regul_rate * model.apply(
                params, h, t, r, method="regularization"
            )
        if self.l3_regul_rate != 0.0:
            loss = loss + self.l3_regul_rate * model.apply(
                params, method="l3_regularization"
            )
        return loss
