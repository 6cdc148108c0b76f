"""Knowledge-graph-embedding toolkit with OpenKE capability parity, TPU-native.

The reference vendors THU's OpenKE (reference ``OpenKE/``): a Python model zoo
(TransE/TransH/TransR/TransD/DistMult/ComplEx/RESCAL/Analogy/SimplE/RotatE/
HolE), margin/sigmoid/softplus losses, a negative-sampling strategy, a
Trainer/Tester pair, and a C++ pthread sampling/evaluation backend (Base.so).

This rebuild keeps the same capability surface but runs the whole training and
evaluation loop on-device:

- models are ``flax.linen`` modules scoring padded batches of (h, r, t) ids,
- negative sampling happens **in-graph** (uniform/Bernoulli corruption with
  sorted-key membership filtering), so an entire epoch compiles to one XLA
  program with no host round-trips,
- link-prediction ranking scores all entities per test triple as batched
  matmul/broadcast ops with raw + filtered ranks computed on device,
- a C++ library with the same ``extern "C"`` surface as OpenKE's Base.so
  (``skghoi_tpu/kge/native``) provides a host-side behavioral oracle.
"""

from skghoi_tpu.kge.data import KGData
from skghoi_tpu.kge.losses import MarginLoss, SigmoidLoss, SoftplusLoss
from skghoi_tpu.kge.models import (
    Analogy,
    ComplEx,
    DistMult,
    HolE,
    RESCAL,
    RotatE,
    SimplE,
    TransD,
    TransE,
    TransH,
    TransR,
)
from skghoi_tpu.kge.strategy import NegativeSampling
from skghoi_tpu.kge.trainer import Trainer
from skghoi_tpu.kge.tester import Tester

__all__ = [
    "KGData",
    "MarginLoss",
    "SigmoidLoss",
    "SoftplusLoss",
    "TransE",
    "TransH",
    "TransR",
    "TransD",
    "DistMult",
    "ComplEx",
    "RESCAL",
    "Analogy",
    "SimplE",
    "RotatE",
    "HolE",
    "NegativeSampling",
    "Trainer",
    "Tester",
]
