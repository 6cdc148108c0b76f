"""Detector backbone assembly (ResNet-50 + FPN) and torch weight conversion.

The reference builds its feature extractor from an mmdet config + checkpoint
(``models/adamixer_transH_spatial_r50_models.py:144-157``; both files absent
from the checkout, with hard-coded cluster paths).  Here the backbone is an
explicit module pair, and :func:`load_torch_resnet50` maps a
torchvision-style ``resnet50`` state dict (also the layout inside mmdet
checkpoints, modulo the ``backbone.`` prefix) onto the Flax parameter tree so
pre-trained detector weights can be imported for mAP-parity runs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.models.fpn import FPN
from skghoi_tpu.models.resnet import ResNet50

Array = jax.Array


class DetectorBackbone(nn.Module):
    """backbone -> neck, returning the 4-level pyramid (strides 4,8,16,32).

    ``frozen_stages`` passes through to :class:`ResNet50` (mmdet semantics;
    the reference's mmdet-built R50 trains with ``frozen_stages=1``).
    """

    dtype: Any = jnp.float32
    frozen_stages: int = -1
    remat_stages: int = 0
    scan_blocks: bool = True

    def setup(self):
        self.backbone = ResNet50(dtype=self.dtype, frozen_stages=self.frozen_stages,
                                 remat_stages=self.remat_stages,
                                 scan_blocks=self.scan_blocks)
        self.neck = FPN(dtype=self.dtype)

    def __call__(self, images: Array) -> Tuple[Array, ...]:
        return self.neck(self.backbone(images))


def _conv_w(t) -> np.ndarray:
    # torch conv weight [O, I, kh, kw] -> flax [kh, kw, I, O]
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _stack_trees(trees):
    """Stack a list of identically-structured dicts leaf-wise on axis 0."""
    import jax.tree_util as jtu

    return jtu.tree_map(lambda *leaves: np.stack(leaves), *trees)


def convert_resnet_block_layout(tree, to_scan: bool = True):
    """Convert any pytree between the unrolled (``layer{s}_block{b}``) and
    scanned (``layer{s}_rest`` stacked on axis 0) ResNet parameter layouts.

    Walks nested dicts, so it works on whole checkpoints (params, optimizer
    mu/nu, batch_stats) regardless of prefix depth — round-1..4 checkpoints
    were saved unrolled; ``ResNet50(scan_blocks=True)`` (the new default)
    expects the stacked layout.  Non-matching subtrees pass through
    untouched; the conversion round-trips exactly.
    """
    import re

    import jax.tree_util as jtu

    if isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        return type(tree)(convert_resnet_block_layout(v, to_scan) for v in tree)
    if hasattr(tree, "_fields"):  # namedtuple (e.g. optax states)
        return type(tree)(*(convert_resnet_block_layout(v, to_scan) for v in tree))
    if not isinstance(tree, dict):
        return tree
    out = {k: convert_resnet_block_layout(v, to_scan) for k, v in tree.items()}
    if to_scan:
        stages: Dict[str, list] = {}
        for k in out:
            m = re.fullmatch(r"(layer\d+)_block(\d+)", k)
            if m and int(m.group(2)) >= 1:
                stages.setdefault(m.group(1), []).append((int(m.group(2)), k))
        for stage, items in stages.items():
            items.sort()
            if [i for i, _ in items] != list(range(1, len(items) + 1)):
                continue  # non-contiguous tail: not a block group, leave it
            if f"{stage}_rest" in out:
                continue
            subs = [out.pop(k) for _, k in items]
            out[f"{stage}_rest"] = _stack_trees(subs)
    else:
        for k in list(out):
            m = re.fullmatch(r"(layer\d+)_rest", k)
            if not m:
                continue
            stacked = out.pop(k)
            n = int(np.asarray(jtu.tree_leaves(stacked)[0]).shape[0])
            for i in range(n):
                out[f"{m.group(1)}_block{i + 1}"] = jtu.tree_map(
                    lambda x, i=i: np.asarray(x)[i], stacked
                )
    return out


def load_torch_resnet50(
    state_dict: Dict[str, Any], prefix: str = "", scan_blocks: bool = True
) -> Tuple[dict, dict]:
    """Convert a torch resnet50 state dict into (params, batch_stats) subtrees
    matching :class:`ResNet50`'s naming.

    Accepts torchvision naming (``layer1.0.conv1.weight`` ...); pass
    ``prefix='backbone.'`` for mmdet checkpoints.  With ``scan_blocks``
    (matching :class:`ResNet50`'s default) each stage's tail blocks are
    stacked on a leading axis under ``layer{s}_rest`` for the scanned layout.
    """

    def g(name):
        return state_dict[prefix + name]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": np.asarray(g(torch_name + ".weight")),
            "bias": np.asarray(g(torch_name + ".bias")),
        }
        stats[flax_name] = {
            "mean": np.asarray(g(torch_name + ".running_mean")),
            "var": np.asarray(g(torch_name + ".running_var")),
        }

    params["stem_conv"] = {"kernel": _conv_w(g("conv1.weight"))}
    put_bn("stem_bn", "bn1")

    stage_sizes = (3, 4, 6, 3)
    for stage, blocks in enumerate(stage_sizes):
        tail_p, tail_s = [], []
        for block in range(blocks):
            tb = f"layer{stage + 1}.{block}"
            fb = f"layer{stage + 1}_block{block}"
            sub: Dict[str, Any] = {}
            sub_stats: Dict[str, Any] = {}
            for i in (1, 2, 3):
                sub[f"conv{i}"] = {"kernel": _conv_w(g(f"{tb}.conv{i}.weight"))}
            if prefix + f"{tb}.downsample.0.weight" in state_dict:
                sub["downsample_conv"] = {"kernel": _conv_w(g(f"{tb}.downsample.0.weight"))}
            # BN blocks live beside the convs in the flax tree
            for i in (1, 2, 3):
                bn_params = {
                    "scale": np.asarray(g(f"{tb}.bn{i}.weight")),
                    "bias": np.asarray(g(f"{tb}.bn{i}.bias")),
                }
                bn_stats = {
                    "mean": np.asarray(g(f"{tb}.bn{i}.running_mean")),
                    "var": np.asarray(g(f"{tb}.bn{i}.running_var")),
                }
                sub[f"bn{i}"] = bn_params
                sub_stats[f"bn{i}"] = bn_stats
            if prefix + f"{tb}.downsample.1.weight" in state_dict:
                sub["downsample_bn"] = {
                    "scale": np.asarray(g(f"{tb}.downsample.1.weight")),
                    "bias": np.asarray(g(f"{tb}.downsample.1.bias")),
                }
                sub_stats["downsample_bn"] = {
                    "mean": np.asarray(g(f"{tb}.downsample.1.running_mean")),
                    "var": np.asarray(g(f"{tb}.downsample.1.running_var")),
                }
            if scan_blocks and block > 0:
                tail_p.append(sub)
                tail_s.append(sub_stats)
            else:
                params[fb] = sub
                stats[fb] = sub_stats
        if tail_p:
            params[f"layer{stage + 1}_rest"] = _stack_trees(tail_p)
            stats[f"layer{stage + 1}_rest"] = _stack_trees(tail_s)
    return params, stats
