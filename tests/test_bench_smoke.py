"""Smoke tests for bench.py — the driver's round-end scoreboard artifact.

bench.py is executed unattended on real TPU hardware at the end of every
round; an API drift between it and the library (model kwargs, batch
factories, detector signatures) would silently null the round's BENCH
artifact.  These tests run every measurement path at tiny geometry on CPU:
same code, same tracing, two orders of magnitude less compile/compute.

The numbers themselves are meaningless on a contended host CPU and are only
checked for being finite and positive.
"""

import numpy as np
import pytest

import bench


def test_measure_inference_smoke():
    stats = bench.measure(batch_size=1, canvas=(64, 96), iters=2, repeats=2)
    assert set(stats) == {"median", "min", "max"}
    assert np.isfinite(stats["median"]) and stats["median"] > 0
    assert stats["min"] <= stats["median"] <= stats["max"]


def test_measure_inference_unrolled_smoke():
    # scan_blocks=False is the A/B arm perf_phase_r5.py measures on chip.
    stats = bench.measure(batch_size=1, canvas=(64, 96), iters=2, repeats=1,
                          scan_blocks=False)
    assert np.isfinite(stats["median"]) and stats["median"] > 0


def test_measure_train_smoke():
    v = bench.measure_train(batch_size=2, canvas=(64, 96), iters=2)
    assert np.isfinite(v) and v > 0


def test_measure_train_remat_smoke():
    v = bench.measure_train(batch_size=2, canvas=(64, 96), iters=2,
                            remat_stages=2)
    assert np.isfinite(v) and v > 0


def test_measure_stage1_smoke():
    stats = bench.measure_stage1(batch_size=1, canvas=(64, 96), iters=2,
                                 repeats=1)
    assert np.isfinite(stats["median"]) and stats["median"] > 0
