"""Torch/mmdet state-dict layout conversion for the AdaMixer decoder.

The reference's AdaMixer checkpoint lives at an absent hard-coded cluster
path (``models/adamixer_transH_spatial_r50_models.py:144-145``), so weight
parity is unprovable here; what *is* testable is the layout contract: the
torch twin (:mod:`skghoi_tpu.oracle.adamixer`) is written with
mmdet-idiomatic modules (``nn.Linear`` ``[out, in]`` weights,
``nn.LayerNorm``), and these converters map such a state dict onto the Flax
parameter tree.  ``tests/test_adamixer.py`` round-trips random torch weights
through :func:`load_torch_mixing` and asserts output agreement, which pins
the transpose/naming conventions a real mmdet checkpoint would need.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _lin(sd: Dict[str, Any], name: str) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _ln(sd: Dict[str, Any], name: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def load_torch_mixing(state_dict: Dict[str, Any], prefix: str = "") -> dict:
    """State dict of :class:`oracle.adamixer.AdaptiveMixingTorch` ->
    params for :class:`skghoi_tpu.detect.adamixer.AdaptiveMixing`."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    return {
        "channel_mixer": _lin(sd, "channel_mixer"),
        "spatial_mixer": _lin(sd, "spatial_mixer"),
        "ln_c": _ln(sd, "ln_c"),
        "ln_s": _ln(sd, "ln_s"),
        "out_proj": _lin(sd, "out_proj"),
    }
