"""Mesh construction and sharding helpers.

The reference scales with one NCCL process per GPU plus DDP gradient buckets
and explicit ``all_reduce``/``all_gather`` calls (SURVEY.md §2.3).  Here a
single program owns a ``jax.sharding.Mesh`` with a 1-D ``data`` axis: batches
are sharded on their leading axis, parameters are replicated, and XLA inserts
the gradient reductions (ICI collectives) during compilation.  The loss
normalizers that the reference all-reduces by hand (``n_p``,
``heads/...head.py:167-172``) become plain global sums under this layout.

The model itself is small (~56M params) and the reference is data-parallel
only, so the mesh is 1-D by design; the helpers accept an arbitrary device
list so the same code runs on a real TPU slice or the virtual CPU mesh used
in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array leaf along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
