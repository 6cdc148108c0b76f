"""Multi-host initialization helper.

The reference rendezvouses its GPU processes through
``MASTER_ADDR=localhost:8888`` env vars + ``mp.spawn``
(``configures/.../main.py:26-31,176-179``).  On TPU pods each host runs ONE
process that owns its local chips; :func:`initialize` wires them into a single
global mesh via ``jax.distributed`` using either explicit arguments or the
standard env vars (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
``JAX_PROCESS_ID``).  On a single host it is a no-op, so entry points can call
it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if not coordinator_address or not num_processes or num_processes <= 1:
        return  # single host

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} global devices"
    )
