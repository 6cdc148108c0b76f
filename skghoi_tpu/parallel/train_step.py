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

from functools import partial
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
    donate: bool = True,
) -> Callable:
    """Returns ``step(params, extra_vars, opt_state, batch, rng)``.

    ``donate=True`` (default) donates params/opt_state to the jit so XLA
    updates the optimizer state in place instead of writing fresh copies of
    ~670 MB of fp32 master state each step; every production caller threads
    the returned state through.  Pass ``donate=False`` for A/B comparisons
    that must call the step twice with the same input pytrees (note
    ``replicate()`` can alias the source buffers, so donating one copy can
    invalidate the other).

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

    @partial(jax.jit, donate_argnums=(0, 2) if donate else ())
    def train_step(params, extra_vars, opt_state, batch: HOIBatch, rng):
        def loss_fn(p):
            out = model.apply({"params": p, **extra_vars}, batch, ovm, training=True, rng=rng)
            losses = out.losses
            total = sum(losses[k] for k in keys)
            return total, (losses, out)

        (total, (losses, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # The reference checks the loss BEFORE backward (utils.py:218-219), so a
        # NaN iteration never touches parameters.  Replicate that on device:
        # apply the update only when both the loss and every gradient are
        # finite; otherwise keep params/opt_state unchanged (the engine still
        # raises on host from the returned loss).
        grads_ok = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        ok = jnp.isfinite(total) & grads_ok
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)
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
