"""Full-model weight conversion: reference/twin torch ``state_dict`` -> Flax.

Covers every ``model_state_dict`` key family of the reference checkpoint
(``configures/hicodet/adamixer_transH_spatial_r50_main.py:88-93``): backbone,
neck, graph-head MLPs, MBF branches, LayerNorms, TransH embeddings, pair
predictor/suppressor.  The twin (:mod:`skghoi_tpu.oracle.twin`) emits exactly
these keys, so ``twin.state_dict() -> to_flax_variables`` yields weights for
:class:`skghoi_tpu.models.scg.SpatiallyConditionedGraph` that reproduce the
torch forward (asserted in ``tests/test_reference_parity.py``).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from skghoi_tpu.models.backbone import load_torch_resnet50


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd, name) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[name + ".weight"]).T, "bias": _np(sd[name + ".bias"])}


def _layernorm(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[name + ".weight"]), "bias": _np(sd[name + ".bias"])}


def _embedding(sd, name) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[name + ".weight"])}


def _mbf(sd, name, cardinality: int = 16) -> Dict[str, np.ndarray]:
    w = lambda fc, k: _np(sd[f"{name}.{fc}.{k}.weight"]).T
    b = lambda fc, k: _np(sd[f"{name}.{fc}.{k}.bias"])
    return {
        "w1": np.stack([w("fc_1", k) for k in range(cardinality)]),
        "b1": np.stack([b("fc_1", k) for k in range(cardinality)]),
        "w2": np.stack([w("fc_2", k) for k in range(cardinality)]),
        "b2": np.stack([b("fc_2", k) for k in range(cardinality)]),
        "w3": np.stack([w("fc_3", k) for k in range(cardinality)]),
        "b3": np.stack([b("fc_3", k) for k in range(cardinality)]),
    }


def _conv(sd, name) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[name + ".weight"]), (2, 3, 1, 0))}
    if name + ".bias" in sd:
        out["bias"] = _np(sd[name + ".bias"])
    return out


def to_flax_variables(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Torch ``state_dict`` (twin naming == reference checkpoint naming, plus
    the twin's ``box_pair_head.transh.*``) -> flax ``{"params", "batch_stats"}``
    for :class:`SpatiallyConditionedGraph`."""
    sd = {k: v for k, v in state_dict.items()}

    # --- backbone (torchvision/mmdet resnet50 naming) ----------------------
    bb_params, bb_stats = load_torch_resnet50(sd, prefix="detector_backbone.")

    # --- neck (mmdet FPN naming) -------------------------------------------
    neck = {}
    for i in range(4):
        neck[f"lateral{i}"] = _conv(sd, f"detector_neck.lateral_convs.{i}.conv")
        neck[f"output{i}"] = _conv(sd, f"detector_neck.fpn_convs.{i}.conv")

    # box_head fc1 consumes flattened pooled features: torch flattens
    # [C, P, P] (channel-major), flax [P, P, C] (channel-minor) — permute the
    # weight's input axis accordingly.
    def _box_head_fc1(sd, name, c=256, p=7):
        w = _np(sd[name + ".weight"])  # [out, C*P*P]
        w = w.reshape(-1, c, p, p).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        return {"kernel": w.T, "bias": _np(sd[name + ".bias"])}

    gh = "interaction_head.box_pair_head"
    graph_head = {
        "box_head_fc1": _box_head_fc1(sd, f"{gh}.box_head.1"),
        "box_head_fc2": _linear(sd, f"{gh}.box_head.3"),
        "adjacency": _linear(sd, f"{gh}.adjacency"),
        "sub_to_obj": _mbf(sd, f"{gh}.sub_to_obj"),
        "obj_to_sub": _mbf(sd, f"{gh}.obj_to_sub"),
        "norm_h": _layernorm(sd, f"{gh}.norm_h"),
        "norm_o": _layernorm(sd, f"{gh}.norm_o"),
        "spatial_fc1": _linear(sd, f"{gh}.spatial_head.0"),
        "spatial_fc2": _linear(sd, f"{gh}.spatial_head.2"),
        "spatial_fc3": _linear(sd, f"{gh}.spatial_head.4"),
        "attention_head": _mbf(sd, f"{gh}.attention_head"),
        "attention_head_g": _mbf(sd, f"{gh}.attention_head_g"),
        "fc_head": _linear(sd, f"{gh}.fc_head.0"),
        "fc_tail": _linear(sd, f"{gh}.fc_tail.0"),
    }
    # TransH: absent from real reference checkpoints (the reference re-creates
    # the module per forward); present in twin state dicts.
    if f"{gh}.transh.ent_embeddings.weight" in sd:
        graph_head["transh"] = {
            "ent_embeddings": _embedding(sd, f"{gh}.transh.ent_embeddings"),
            "rel_embeddings": _embedding(sd, f"{gh}.transh.rel_embeddings"),
            "norm_vector": _embedding(sd, f"{gh}.transh.norm_vector"),
        }

    params = {
        "detector": {"backbone": bb_params, "neck": neck},
        "interaction_head": {
            "box_pair_head": graph_head,
            "box_pair_predictor": _linear(sd, "interaction_head.box_pair_predictor"),
            "box_pair_suppressor": _linear(sd, "interaction_head.box_pair_suppressor"),
        },
    }
    batch_stats = {"detector": {"backbone": bb_stats}}
    return {"params": params, "batch_stats": batch_stats}


def merge_into(variables: Dict[str, Any], converted: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively overlay ``converted`` onto initialized ``variables`` (keeps
    any collections/keys conversion does not produce, e.g. a fresh TransH when
    loading a real reference checkpoint)."""

    def rec(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = rec(out[k], v)
            else:
                out[k] = np.asarray(v)
        return out

    return rec(variables, converted)
