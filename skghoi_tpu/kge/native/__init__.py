"""ctypes bindings for the native KGE base library (OpenKE Base.so parity).

The shared library exposes the same ``extern "C"`` surface as the reference's
``OpenKE/openke/base`` backend, so code written against OpenKE's
``TrainDataLoader``/``Tester`` ctypes conventions ports directly.  It serves as
(a) a CPU batch generator alternative to the in-graph JAX sampler, and (b) the
behavioral oracle the JAX path is tested against.

Build on first use (g++ is assumed present):

    lib = load_library()           # builds if missing
    base = NativeBase(lib, "/path/to/benchmark/")
    h, t, r, y = base.sampling(batch_size=1024, neg_rate=25, bern=True)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkge_base.so")


def build_library(force: bool = False) -> str:
    if force or not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    lib.sampling.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_bool,
        ctypes.c_bool,
        ctypes.c_bool,
    ]
    lib.testHead.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_bool]
    lib.testTail.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_bool]
    # Pointer args must be declared or ctypes truncates them to 32-bit ints.
    lib.getHeadBatch.argtypes = [ctypes.c_void_p] * 3
    lib.getTailBatch.argtypes = [ctypes.c_void_p] * 3
    lib.getTestBatch.argtypes = [ctypes.c_void_p] * 6
    lib.getValidBatch.argtypes = [ctypes.c_void_p] * 6
    lib.test_link_prediction.argtypes = [ctypes.c_bool]
    for name in ("getTestLinkMRR", "getTestLinkMR", "getTestLinkHit10", "getTestLinkHit3", "getTestLinkHit1"):
        getattr(lib, name).restype = ctypes.c_float
        getattr(lib, name).argtypes = [ctypes.c_bool]
    for name in (
        "getEntityTotal",
        "getRelationTotal",
        "getTrainTotal",
        "getTestTotal",
        "getValidTotal",
        "getTripleTotal",
        "getWorkThreads",
    ):
        getattr(lib, name).restype = ctypes.c_int64
    return lib


class NativeBase:
    """High-level wrapper mirroring OpenKE's TrainDataLoader usage."""

    def __init__(self, lib: Optional[ctypes.CDLL] = None, in_path: str = "",
                 work_threads: int = 1, bern: bool = False):
        self.lib = lib or load_library()
        if in_path and not in_path.endswith("/"):
            in_path += "/"
        self.lib.setInPath(ctypes.create_string_buffer(in_path.encode(), len(in_path) * 2 + 2))
        self.lib.setWorkThreads(ctypes.c_int64(work_threads))
        self.lib.setBern(ctypes.c_int64(int(bern)))
        self.lib.randReset()
        self.lib.importTrainFiles()
        self.ent_tot = self.lib.getEntityTotal()
        self.rel_tot = self.lib.getRelationTotal()
        self.train_tot = self.lib.getTrainTotal()

    def import_test_files(self):
        self.lib.importTestFiles()
        self.test_tot = self.lib.getTestTotal()

    def sampling(
        self, batch_size: int, neg_rate: int = 1, neg_rel_rate: int = 0, mode: int = 0
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        total = batch_size * (1 + neg_rate + neg_rel_rate)
        h = np.zeros(total, np.int64)
        t = np.zeros(total, np.int64)
        r = np.zeros(total, np.int64)
        y = np.zeros(total, np.float32)
        self.lib.sampling(
            h.ctypes.data,
            t.ctypes.data,
            r.ctypes.data,
            y.ctypes.data,
            batch_size,
            neg_rate,
            neg_rel_rate,
            mode,
            True,
            False,
            False,
        )
        return h, t, r, y
