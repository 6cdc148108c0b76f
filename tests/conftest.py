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

# Persistent XLA compilation cache: the fast suite's wall time is dominated
# by recompiles of the same programs session after session; the cache (works
# on CPU in jax 0.9, verified) makes repeat sessions load executables
# instead.  Shared with the driver gates (__graft_entry__) on purpose.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402

# Marker map (one place, no per-file edits): the suite outgrew a single
# sitting on one core, so heavy modules carry ``slow`` and the CI-shaped
# fast subset is ``pytest -m "not slow" tests/``.
_SLOW_MODULES = {
    "test_multichip",          # sharded step == single device (minutes)
    "test_multichip_depth",    # trajectories + orbax + 2-process rendezvous
    "test_reference_parity",   # full-model twin parity (~1 min)
    "test_training_learns",    # repeated SCG train steps
    "test_engine_resume",      # synthetic pipeline + checkpoint round trip
    "test_model_forward",      # full SCG compile
    "test_detr",               # transformer compile + converter
    "test_frcnn",              # detector compile + converter
    "test_detector",           # detector training overfit
    "test_torch_converter",    # full-model weight conversion
    "test_cli_pipeline",       # chained argparse mains over a tmpdir
    "test_adamixer",           # decoder compile + oracle + overfit
    "test_parity_degenerate",  # full-model twin parity on edge cases
    "test_bench_smoke",        # every bench.py measurement path compiles
}
_MESH_MODULES = {"test_multichip", "test_multichip_depth"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if mod in _MESH_MODULES:
            item.add_marker(pytest.mark.mesh)
