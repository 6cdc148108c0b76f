"""The on-device NaN guard: a non-finite iteration must never touch params.

Reference semantics: ``utils.py:218-219`` checks the loss *before* backward,
so a NaN batch leaves the model untouched.  Our jitted step applies the
optimizer update only when the loss and every gradient are finite
(``parallel/train_step.py``); the engine still raises on host afterwards.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
import optax

from skghoi_tpu.parallel.train_step import build_train_step


class _Out(NamedTuple):
    losses: dict


class _ToyModel:
    """Duck-typed stand-in: loss = sum(w * batch) per loss key."""

    def apply(self, variables, batch, ovm, training=True, rng=None):
        w = variables["params"]["w"]
        loss = jnp.sum(w * batch)
        return _Out(
            losses={
                "hoi_loss": loss,
                "interactiveness_loss": 0.1 * loss,
                "transh_loss": 0.0 * loss,
            }
        )


def _setup():
    params = {"w": jnp.ones((3,), jnp.float32)}
    tx = optax.sgd(0.5, momentum=0.9)
    step = build_train_step(_ToyModel(), tx, object_verb_mask=np.ones((2, 2)))
    return params, tx.init(params), step


def test_finite_batch_updates_params():
    params, opt_state, step = _setup()
    # The step donates params/opt_state, so snapshot to host before calling.
    w_before = np.asarray(params["w"]).copy()
    new_params, _, total, losses, _ = step(
        params, {}, opt_state, jnp.asarray([1.0, 2.0, 3.0]), jnp.zeros((2,), jnp.uint32)
    )
    assert np.isfinite(float(total))
    assert not np.allclose(np.asarray(new_params["w"]), w_before)


def test_nan_batch_leaves_params_and_opt_state_untouched():
    import jax

    params, opt_state, step = _setup()
    # The step donates params/opt_state, so snapshot to host before calling.
    w_before = np.asarray(params["w"]).copy()
    old_leaves = [np.asarray(l).copy() for l in jax.tree_util.tree_leaves(opt_state)]
    nan_batch = jnp.asarray([1.0, jnp.nan, 3.0])
    new_params, new_opt, total, losses, _ = step(
        params, {}, opt_state, nan_batch, jnp.zeros((2,), jnp.uint32)
    )
    # host still sees the NaN, so the engine's ValueError fires as before
    assert np.isnan(float(losses["hoi_loss"]))
    np.testing.assert_array_equal(np.asarray(new_params["w"]), w_before)
    # momentum/accumulator state must also be pristine
    new_leaves = jax.tree_util.tree_leaves(new_opt)
    assert len(old_leaves) == len(new_leaves) and len(new_leaves) > 0
    for a, b in zip(new_leaves, old_leaves):
        np.testing.assert_array_equal(np.asarray(a), b)
