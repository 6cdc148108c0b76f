"""Checkpoint save/resume with the reference's logical keys.

Reference checkpoints are torch dicts with keys ``model_state_dict``,
``optim_state_dict``, ``scheduler_state_dict``, ``epoch``, ``iteration``
(``configures/.../main.py:88-93``, read back by cache/test/demo entries).
The rebuild keeps the same logical keys over orbax; the scheduler is a pure
function of the step, so its "state" is the step counter.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any,
    epoch: int,
    iteration: int,
) -> None:
    path = os.path.abspath(path)
    payload = {
        "model_state_dict": params,
        "optim_state_dict": opt_state,
        "scheduler_state_dict": {"step": np.asarray(iteration)},
        "epoch": np.asarray(epoch),
        "iteration": np.asarray(iteration),
    }
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(
    path: str, params_like: Any, opt_state_like: Optional[Any] = None
) -> Dict[str, Any]:
    """Restore into the provided abstract/example pytrees.

    With ``opt_state_like=None`` (eval-only restore, like the reference's
    cache/test entries reading just ``model_state_dict``), the checkpoint is
    read without a structural target.
    """
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if opt_state_like is None:
        return ckpt.restore(path)
    target = {
        "model_state_dict": params_like,
        "optim_state_dict": opt_state_like,
        "scheduler_state_dict": {"step": np.asarray(0)},
        "epoch": np.asarray(0),
        "iteration": np.asarray(0),
    }
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    try:
        return ckpt.restore(path, abstract)
    except Exception:
        return _restore_converting_layout(ckpt, path, params_like, opt_state_like)


def _restore_converting_layout(ckpt, path, params_like, opt_state_like):
    """Layout-compat restore: checkpoints saved before the scanned backbone
    (unrolled ``layer{s}_block{b}``) load into a ``scan_blocks=True`` model,
    and vice versa.

    The checkpoint is read without a target (raw nested dicts), the ResNet
    block groups are converted to the target layout, and the optimizer state
    is re-threaded onto ``opt_state_like``'s treedef with a per-leaf shape
    check — a mismatch raises instead of silently loading garbage.
    """
    from skghoi_tpu.models.backbone import convert_resnet_block_layout

    flat = jax.tree_util.tree_flatten_with_path(params_like)[0]
    to_scan = any(
        "_rest" in getattr(k, "key", getattr(k, "name", str(k)))
        for p, _ in flat
        for k in p
    )
    raw = ckpt.restore(path)
    params = convert_resnet_block_layout(raw["model_state_dict"], to_scan=to_scan)
    jax.tree_util.tree_map(  # structure + shape must agree exactly now
        lambda like, got: None
        if tuple(np.shape(like)) == tuple(np.shape(got))
        else (_ for _ in ()).throw(
            ValueError(f"shape mismatch after layout conversion: "
                       f"{np.shape(like)} vs {np.shape(got)}")),
        params_like, params,
    )
    raw["model_state_dict"] = params

    opt_conv = convert_resnet_block_layout(raw["optim_state_dict"], to_scan=to_scan)
    leaves_like, treedef = jax.tree_util.tree_flatten(opt_state_like)
    leaves_raw = jax.tree_util.tree_leaves(opt_conv)
    if len(leaves_like) != len(leaves_raw) or any(
        tuple(np.shape(a)) != tuple(np.shape(b))
        for a, b in zip(leaves_like, leaves_raw)
    ):
        raise ValueError(
            "checkpoint optimizer state does not align with the target "
            "optimizer after ResNet layout conversion; re-save the "
            "checkpoint with the current layout (load params-only via "
            "load_checkpoint(path, params_like) and restart the schedule), "
            f"path={path}"
        )
    raw["optim_state_dict"] = jax.tree_util.tree_unflatten(treedef, leaves_raw)
    return raw
