"""Checkpoint compatibility across the scanned-backbone layout change.

Rounds 1-4 saved orbax checkpoints with unrolled ``layer{s}_block{b}``
parameter trees; ``ResNet50(scan_blocks=True)`` (the round-5 default) stacks
stage tails under ``layer{s}_rest``.  ``load_checkpoint`` must restore old
checkpoints into the new layout (and vice versa) without silent corruption.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from skghoi_tpu.models.backbone import convert_resnet_block_layout
from skghoi_tpu.models.resnet import ResNet50
from skghoi_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def test_convert_layout_roundtrips_nested_tree():
    rng = np.random.default_rng(0)
    block = lambda: {"conv1": {"kernel": rng.normal(size=(1, 1, 4, 4))}}
    tree = {
        "detector": {
            "backbone": {
                "layer1_block0": block(),
                "layer1_block1": block(),
                "layer1_block2": block(),
                "layer2_block0": block(),
            },
        },
        "head": {"w": rng.normal(size=(3,))},
    }
    scanned = convert_resnet_block_layout(tree, to_scan=True)
    bb = scanned["detector"]["backbone"]
    assert "layer1_rest" in bb and "layer1_block1" not in bb
    assert bb["layer1_rest"]["conv1"]["kernel"].shape == (2, 1, 1, 4, 4)
    assert "layer2_rest" not in bb  # single-block stage: nothing to stack
    back = convert_resnet_block_layout(scanned, to_scan=False)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, back, tree
    )


def test_convert_layout_skips_noncontiguous_groups():
    tree = {"layer1_block0": {"w": np.ones(2)}, "layer1_block2": {"w": np.ones(2)}}
    out = convert_resnet_block_layout(tree, to_scan=True)
    assert set(out) == {"layer1_block0", "layer1_block2"}


@pytest.mark.parametrize("save_scan,load_scan", [(False, True), (True, False)])
def test_checkpoint_restores_across_layouts(tmp_path, save_scan, load_scan):
    x = jnp.zeros((1, 64, 64, 3))
    tx = optax.adamw(1e-4)

    src = ResNet50(scan_blocks=save_scan, stage_sizes=(2, 2))
    src_params = src.init(jax.random.PRNGKey(0), x)["params"]
    src_opt = tx.init(src_params)
    save_checkpoint(str(tmp_path / "ck"), src_params, src_opt, epoch=3, iteration=7)

    dst = ResNet50(scan_blocks=load_scan, stage_sizes=(2, 2))
    dst_params = dst.init(jax.random.PRNGKey(1), x)["params"]
    dst_opt = tx.init(dst_params)

    restored = load_checkpoint(str(tmp_path / "ck"), dst_params, dst_opt)
    assert int(restored["epoch"]) == 3 and int(restored["iteration"]) == 7

    # The restored params must equal the source params under conversion.
    expected = convert_resnet_block_layout(
        jax.tree_util.tree_map(np.asarray, src_params), to_scan=load_scan
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        expected, restored["model_state_dict"],
    )
    # Optimizer state landed on the target treedef.
    assert (
        jax.tree_util.tree_structure(restored["optim_state_dict"])
        == jax.tree_util.tree_structure(dst_opt)
    )
