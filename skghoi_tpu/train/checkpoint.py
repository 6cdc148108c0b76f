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
    return ckpt.restore(path, abstract)
