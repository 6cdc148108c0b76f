"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of a "fake backend": multi-chip sharding logic
is validated on host CPU with ``--xla_force_host_platform_device_count=8``
(SURVEY.md §4).

NOTE on this machine: a sitecustomize hook registers the remote-TPU (axon)
backend at interpreter start and pins ``jax_platforms`` — environment
variables alone do NOT reliably select CPU.  ``jax.config.update`` after
import is the authoritative override; ``XLA_FLAGS`` is still read lazily at
first backend initialization, so setting it here (before any jax op) works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
