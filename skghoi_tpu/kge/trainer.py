"""On-device KGE trainer: a whole epoch compiles to one XLA program.

The reference trainer (``OpenKE/openke/config/Trainer.py:56-99``) runs a
Python loop: C++ sampler -> numpy -> torch -> optimizer step, once per batch.
Here an epoch is ``lax.scan`` over steps; each step draws its batch in-graph
(:func:`~skghoi_tpu.kge.sampling.sample_batch`), evaluates the strategy loss,
and applies an optax update — no host transfers until the epoch's mean loss is
fetched.  Optimizer factory mirrors the reference's SGD/Adagrad/Adadelta/Adam
choices with the same default hyper-parameters.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import serialization

from skghoi_tpu.kge.sampling import DeviceKG, sample_batch, sample_batch_oneside
from skghoi_tpu.kge.strategy import NegativeSampling


def _torch_adagrad(lr: float, eps: float = 1e-10):
    """Adagrad with torch's update rule ``g / (sqrt(accum) + eps)``.

    optax.adagrad puts eps INSIDE the sqrt (``g / sqrt(accum + eps)``), which
    damps the first step of tiny-gradient elements: for ``|g| ~ 1e-6`` torch
    still takes a full ``±lr`` sign step while optax takes ~0.1*lr.  That
    kick is load-bearing — SimplE/Analogy on WN18RR start with triple-product
    score gradients ~1e-6; without it the L2 term's pull dominates and the
    11-row relation tables collapse to exactly 0 (measured: rel norm
    4.5 -> 0.0036 in 2 epochs, loss frozen at softplus(0) forever), while
    the same recipe under torch semantics trains.  Past the first steps the
    two rules agree to ~1e-5 relative (accum >> eps)."""

    def init(params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def update(grads, state, params=None):
        del params
        accum = jax.tree_util.tree_map(lambda a, g: a + g * g, state, grads)
        upd = jax.tree_util.tree_map(
            lambda g, a: -lr * g / (jnp.sqrt(a) + eps), grads, accum
        )
        return upd, accum

    return optax.GradientTransformation(init, update)


def make_optimizer(opt_method: str, alpha: float, lr_decay: float = 0.0, weight_decay: float = 0.0):
    m = opt_method.lower()
    if m == "adagrad":
        # torch Adagrad semantics: accumulator starts at 0 (optax defaults to
        # 0.1) AND eps outside the sqrt — the first steps are ~sign(g)*lr,
        # the kick that lets regularized bilinear models escape the tiny
        # xavier-init basin the way the reference training does (see
        # _torch_adagrad for the SimplE collapse this fixes).
        opt = _torch_adagrad(alpha, eps=1e-10)
    elif m == "adadelta":
        opt = optax.adadelta(alpha)
    elif m == "adam":
        opt = optax.adam(alpha)
    else:  # SGD default (reference Trainer.py:82-87)
        opt = optax.sgd(alpha)
    if weight_decay:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


class Trainer:
    def __init__(
        self,
        model,
        params,
        strategy: NegativeSampling,
        kg: DeviceKG,
        nbatches: int = 100,
        neg_rate: int = 1,
        bern: bool = False,
        filtered: bool = True,
        train_times: int = 1000,
        alpha: float = 0.5,
        opt_method: str = "sgd",
        weight_decay: float = 0.0,
        save_steps: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
        log_fn: Callable[[str], None] = print,
        seed: int = 0,
        sampling_mode: str = "normal",
        mesh=None,
    ):
        """``mesh``: optional 1-D ``jax.sharding.Mesh`` with a ``data`` axis.
        When given, each device draws its own ``batch_size / n_devices``
        slice in-graph and gradients are ``psum``-averaged before the
        (replicated) optimizer update — the TPU-native counterpart of the
        per-worker sampling + DDP all-reduce the reference would use (OpenKE
        itself is single-GPU; the HOI side's engine is the DDP reference,
        ``utils.py:209-210``)."""
        self.model = model
        self.params = params
        self.kg = kg
        self.train_times = train_times
        self.save_steps = save_steps
        self.checkpoint_dir = checkpoint_dir
        self.log_fn = log_fn
        self.key = jax.random.PRNGKey(seed)

        batch_size = max(1, int(kg.train_h.shape[0] / nbatches))
        self.nbatches = nbatches
        tx = make_optimizer(opt_method, alpha, weight_decay=weight_decay)
        self.opt_state = tx.init(params)

        # "oneside" draws the corruption side per row (the reference's cross-
        # mode structure) and scores via the folded score_one_side fast path —
        # ~3x less gather/scatter traffic per step on TPU.
        sampler = sample_batch_oneside if sampling_mode == "oneside" else sample_batch

        n_dev = mesh.devices.size if mesh is not None else 1
        local_bs = max(1, batch_size // n_dev)

        def loss_fn(params, key):
            batch = sampler(key, kg, local_bs if mesh is not None else batch_size,
                            neg_rate, bern=bern, filtered=filtered)
            return strategy(model, params, batch)

        def step(carry, key):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            if mesh is not None:
                # Per-device batches -> DDP-style gradient/loss mean.
                grads = jax.lax.pmean(grads, "data")
                loss = jax.lax.pmean(loss, "data")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        if mesh is None:

            @partial(jax.jit, donate_argnums=(0, 1))
            def epoch(params, opt_state, key):
                keys = jax.random.split(key, nbatches)
                (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
                return params, opt_state, jnp.sum(losses)

        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(), P("data")),
                out_specs=(P(), P(), P()),
                check_rep=False,
            )
            def sharded_epoch(params, opt_state, dev_keys):
                keys = jax.vmap(lambda i: jax.random.fold_in(dev_keys[0], i))(
                    jnp.arange(nbatches)
                )
                (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
                return params, opt_state, jnp.sum(losses)

            jitted = jax.jit(sharded_epoch, donate_argnums=(0, 1))

            def epoch(params, opt_state, key):
                dev_keys = jax.random.split(key, n_dev)
                return jitted(params, opt_state, dev_keys)

        self._epoch = epoch

    def run(self):
        t0 = time.time()
        for ep in range(self.train_times):
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, loss = self._epoch(self.params, self.opt_state, sub)
            if ep % 50 == 0 or ep == self.train_times - 1:
                self.log_fn(
                    f"Epoch {ep} | loss: {float(loss):f} | {time.time() - t0:.1f}s elapsed"
                )
            if self.save_steps and self.checkpoint_dir and (ep + 1) % self.save_steps == 0:
                self.save_checkpoint(os.path.join(self.checkpoint_dir + "-" + str(ep) + ".ckpt"))
        return self.params

    def save_checkpoint(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())
