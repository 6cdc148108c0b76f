"""Learning engine: the hook-based training loop (CustomisedDLE parity).

Reference (``utils.py:200-299`` over pocket's ``DistributedLearningEngine``):
per iteration zero-grad -> forward -> NaN guard -> sum losses -> backward ->
step; per print-interval the cross-rank-averaged HOI/interactiveness losses;
per epoch the training mAP (from a meter fed with every iteration's outputs)
and a validation mAP, printed as

    Epoch: {e} | training mAP: x, evaluation time: t | validation mAP: y, ...

— a de-facto API consumed by ``diagnosis/learning_curve.py:40-46``, so the
format is preserved.  Checkpoints carry the reference's logical keys and are
written every epoch to ``cache_dir`` (``checkpoints/`` by default).

TPU differences: the whole iteration is one jitted step on a sharded batch
(so "cross-rank synchronisation" of meters is just host-side numpy on the
globally-visible outputs), and the engine tracks two compiled programs — one
per canvas orientation.
"""

from __future__ import annotations

import os
import time
import jax
import numpy as np

from skghoi_tpu.eval.hoi_eval import jax_to_numpy, unpack_image_results
from skghoi_tpu.ops.ap import DetectionAPMeter
from skghoi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from skghoi_tpu.parallel.train_step import build_eval_step, build_train_step
from skghoi_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from skghoi_tpu.train.optimizer import build_optimizer


class RunningMeter:
    """Cross-interval loss averaging (SyncedNumericalMeter stand-in)."""

    def __init__(self):
        self.reset()

    def append(self, value: float):
        self.total += float(value)
        self.count += 1

    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self):
        self.total = 0.0
        self.count = 0


class LearningEngine:
    def __init__(
        self,
        model,
        params,
        train_loader,
        val_loader=None,
        num_classes: int = 117,
        object_verb_mask=None,
        print_interval: int = 100,
        cache_dir: str = "./checkpoints",
        learning_rate: float = 1e-4,
        lr_decay: float = 0.1,
        weight_decay: float = 1e-4,
        milestones=(6,),
        seed: int = 0,
        mesh=None,
        use_mesh: bool = True,
        loss_keys=None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.num_classes = num_classes
        self.print_interval = print_interval
        self.cache_dir = cache_dir
        self.rng = jax.random.PRNGKey(seed)
        self.epoch = 0
        self.iteration = 0

        ovm = object_verb_mask
        assert ovm is not None, "object_verb_mask (e.g. dataset.object_verb_mask()) required"

        variables = dict(params)
        self.params = variables.pop("params")
        self.extra_vars = variables  # e.g. frozen batch_stats

        self.tx = build_optimizer(
            self.params,
            learning_rate=learning_rate,
            lr_decay=lr_decay,
            weight_decay=weight_decay,
            steps_per_epoch=max(len(train_loader), 1),
            milestones=milestones,
        )
        self.opt_state = self.tx.init(self.params)

        self.mesh = mesh or (make_mesh() if use_mesh else None)
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.extra_vars = replicate(self.extra_vars, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)

        self.train_step = build_train_step(model, self.tx, ovm, loss_keys=loss_keys)
        self.eval_step = build_eval_step(model, ovm)

        self.hoi_loss = RunningMeter()
        self.intr_loss = RunningMeter()
        self.transh_loss = RunningMeter()

    # ------------------------------------------------------------------
    def _shard(self, batch):
        if self.mesh is None:
            return batch
        return shard_batch(batch, self.mesh)

    def _prepare(self, batch, loader):
        """Raw uint8 batches (``DataFactory(device_resize=True)``) get their
        bilinear resize + mean-filled canvas on device; float batches were
        already canvased on the host and pass through untouched."""
        if batch.images.dtype != np.uint8:
            return batch
        from skghoi_tpu.data.device_preprocess import prepare_batch

        return prepare_batch(batch, loader.factory)

    def run(self, num_epochs: int):
        for _ in range(num_epochs):
            self.train_loader.set_epoch(self.epoch)
            meter = DetectionAPMeter(self.num_classes, algorithm="11P")
            for batch, indices in self.train_loader:
                self.rng, step_rng = jax.random.split(self.rng)
                batch = self._prepare(self._shard(batch), self.train_loader)
                self.params, self.opt_state, total, losses, out = self.train_step(
                    self.params, self.extra_vars, self.opt_state, batch, step_rng
                )
                hoi = float(losses["hoi_loss"])
                if np.isnan(hoi):
                    raise ValueError("The HOI loss is NaN")  # utils.py:218-219
                self.hoi_loss.append(hoi)
                self.intr_loss.append(float(losses["interactiveness_loss"]))
                self.transh_loss.append(float(losses["transh_loss"]))
                if out.metrics is not None:
                    dropped = float(out.metrics.get("transh_pos_dropped", 0.0))
                    if dropped > 0:
                        # The capped TransH sampler truncated positives this
                        # step (ref samples all, :936-943) — never silent.
                        print(f"=> TransH sampler dropped {dropped:.0f} positives over the cap")
                self.iteration += 1
                if self.iteration % self.print_interval == 0:
                    self._print_statistics()
                self._log_results(out, batch, indices, meter)
            self._on_end_epoch(meter)
        return self.params

    def _print_statistics(self):
        print(
            f"=> HOI classification loss: {self.hoi_loss.mean():.4f},",
            f"interactiveness loss: {self.intr_loss.mean():.4f},",
            f"transH loss: {self.transh_loss.mean():.4f}",
        )
        self.hoi_loss.reset()
        self.intr_loss.reset()
        self.transh_loss.reset()

    def _log_results(self, out, batch, indices, meter: DetectionAPMeter):
        """Feed the train meter (``_synchronise_and_log_results`` parity)."""
        out = jax_to_numpy(out)
        labels_all = np.asarray(out.labels) if out.labels is not None else None
        for slot, _ in enumerate(indices):
            res = unpack_image_results(out, batch, slot)
            if labels_all is None:
                continue
            x, y = res["pair_index"][:, 0], res["pair_index"][:, 1]
            k = res["prediction"]
            meter.append(res["scores"], k, labels_all[slot, x, y, k])

    def _on_end_epoch(self, meter: DetectionAPMeter):
        t0 = time.time()
        ap_train = meter.eval().mean()
        t_train = time.time() - t0

        t0 = time.time()
        ap_val = self.validate() if self.val_loader is not None else 0.0
        t_val = time.time() - t0

        print(
            "Epoch: {} | training mAP: {:.4f}, evaluation time: {:.2f}s |"
            "validation mAP: {:.4f}, total time: {:.2f}s\n".format(
                self.epoch, float(ap_train), t_train, float(ap_val), t_val
            )
        )
        self.epoch += 1
        self.save()

    def validate(self) -> float:
        meter = DetectionAPMeter(self.num_classes, algorithm="11P")
        for batch, indices in self.val_loader:
            out = self.eval_step(
                self.params, self.extra_vars,
                self._prepare(self._shard(batch), self.val_loader),
            )
            out = jax_to_numpy(out)
            for slot, ds_index in enumerate(indices):
                res = unpack_image_results(out, batch, slot)
                target = self.val_loader.factory.dataset.raw_target(ds_index)
                # association for the verb-level meter: reuse GT pair labels
                from skghoi_tpu.ops.ap import BoxPairAssociation

                gt_h = np.asarray(target["boxes_h"], np.float64).reshape(-1, 4)
                gt_o = np.asarray(target["boxes_o"], np.float64).reshape(-1, 4)
                gt_h[:, :2] -= 1
                gt_o[:, :2] -= 1
                gt_verbs = np.asarray(
                    target.get("verb", target.get("actions", []))
                ).reshape(-1)
                labels = np.zeros_like(res["scores"])
                assoc = BoxPairAssociation(min_iou=0.5)
                for v in np.unique(res["prediction"]):
                    gt_sel = np.nonzero(gt_verbs == v)[0]
                    det_sel = np.nonzero(res["prediction"] == v)[0]
                    if len(gt_sel):
                        labels[det_sel] = assoc(
                            (gt_h[gt_sel], gt_o[gt_sel]),
                            (res["boxes_h"][det_sel], res["boxes_o"][det_sel]),
                            res["scores"][det_sel],
                        )
                meter.append(res["scores"], res["prediction"], labels)
        return float(meter.eval().mean())

    def save(self):
        os.makedirs(self.cache_dir, exist_ok=True)
        save_checkpoint(
            os.path.join(self.cache_dir, f"ckpt_{self.epoch:02d}"),
            {"params": self.params, **self.extra_vars},
            self.opt_state,
            self.epoch,
            self.iteration,
        )

    def resume(self, path: str):
        restored = load_checkpoint(
            path, {"params": self.params, **self.extra_vars}, self.opt_state
        )
        variables = dict(restored["model_state_dict"])
        self.params = variables.pop("params")
        self.extra_vars = variables
        self.opt_state = restored["optim_state_dict"]
        self.epoch = int(restored["epoch"])
        self.iteration = int(restored["iteration"])
