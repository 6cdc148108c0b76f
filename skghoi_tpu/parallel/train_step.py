"""Jitted train/eval step builders over a data mesh.

One ``jax.jit`` per canvas orientation covers the reference's whole
per-iteration hot path (``utils.py:213-229``): forward (backbone -> neck ->
interaction head), three losses, backward, AdamW update.  With the batch
sharded on ``data`` and parameters replicated, XLA emits the cross-device
gradient ``psum`` (the DDP bucket replacement) automatically, and global sums
inside the loss replace the reference's explicit ``all_reduce`` of positive
counts.

The NaN guard mirrors ``utils.py:218-219`` but stays on device: the step
returns the loss dict, and the engine raises if ``hoi_loss`` is NaN.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from skghoi_tpu.data.structures import HOIBatch


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    object_verb_mask,
    loss_keys: Optional[tuple] = None,
) -> Callable:
    """Returns ``step(params, extra_vars, opt_state, batch, rng)``.

    ``extra_vars`` holds the non-trainable collections (frozen BN
    ``batch_stats``); only ``params`` receives gradients/updates.

    ``loss_keys`` selects which losses drive the gradients, reproducing the
    reference's engine variants (``utils.py:200-424``): the default trains on
    all three; ``("transh_loss",)`` matches ``transH_CustomisedDLE``;
    ``("hoi_loss", "interactiveness_loss")`` matches
    ``OriginalCustomisedDLE`` (no TransH term).
    """
    ovm = jnp.asarray(object_verb_mask)
    keys = tuple(loss_keys) if loss_keys else ("hoi_loss", "interactiveness_loss", "transh_loss")

    @jax.jit
    def train_step(params, extra_vars, opt_state, batch: HOIBatch, rng):
        def loss_fn(p):
            out = model.apply({"params": p, **extra_vars}, batch, ovm, training=True, rng=rng)
            losses = out.losses
            total = sum(losses[k] for k in keys)
            return total, (losses, out)

        (total, (losses, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, losses, out

    return train_step


def build_eval_step(model, object_verb_mask) -> Callable:
    ovm = jnp.asarray(object_verb_mask)

    @jax.jit
    def eval_step(params, extra_vars, batch: HOIBatch):
        return model.apply(
            {"params": params, **extra_vars}, batch._replace(targets=None), ovm, training=False
        )

    return eval_step
