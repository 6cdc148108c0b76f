"""Learning engine: checkpoint/resume roundtrip on the synthetic pipeline."""

import os

import numpy as np
import jax
import pytest

from skghoi_tpu import constants as C
from skghoi_tpu.data.factory import DataFactory, HOILoader
from skghoi_tpu.data.synthetic import make_synthetic_hicodet
from skghoi_tpu.models import SpatiallyConditionedGraph
from skghoi_tpu.train.engine import LearningEngine


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume"))
    make_synthetic_hicodet(root, "train2015", num_images=4)
    factory = DataFactory(
        "hicodet", "train2015", root, os.path.join(root, "detections_train2015"),
        min_size=64, max_size=107, canvas_landscape=(64, 96), canvas_portrait=(96, 64),
    )
    loader = HOILoader(factory, 4, shuffle=False, with_targets=True)
    model = SpatiallyConditionedGraph()
    first, _ = next(iter(loader))
    ovm = factory.dataset.object_verb_mask()
    params = model.init(
        jax.random.PRNGKey(0), first, ovm, training=True, rng=jax.random.PRNGKey(1)
    )
    return model, params, loader, ovm


def test_resume_roundtrip(setup, tmp_path):
    model, params, loader, ovm = setup
    cache = str(tmp_path / "ckpts")
    engine = LearningEngine(
        model, params, loader, None, object_verb_mask=ovm,
        cache_dir=cache, print_interval=1000, use_mesh=False,
    )
    engine.run(1)  # writes ckpt_01
    saved_leaf = np.asarray(jax.tree_util.tree_leaves(engine.params)[0])
    it = engine.iteration

    engine2 = LearningEngine(
        model, params, loader, None, object_verb_mask=ovm,
        cache_dir=cache, print_interval=1000, use_mesh=False,
    )
    engine2.resume(os.path.join(cache, "ckpt_01"))
    assert engine2.epoch == 1
    assert engine2.iteration == it
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(engine2.params)[0]), saved_leaf
    )
    # Training continues cleanly from the restored state.
    engine2.run(1)
    assert engine2.epoch == 2


def test_frozen_params_never_update():
    """torch FrozenBatchNorm2d affine terms are buffers: the reference's
    optimizer never touches them (main.py:113).  The mmdet-built backbone
    additionally trains with frozen_stages=1 (stem + layer1 requires_grad
    False, so never registered with the optimizer).  Our multi_transform must
    pin both groups with set_to_zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skghoi_tpu.train.optimizer import build_optimizer

    params = {
        "detector": {"stem_bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                     "stem_conv": {"kernel": jnp.ones((3, 3, 3, 4))},
                     "layer1_block0": {"conv1": {"kernel": jnp.ones((1, 1, 4, 4))}},
                     "layer2_block0": {"conv1": {"kernel": jnp.ones((1, 1, 4, 4))}}},
        "head": {"fc": {"kernel": jnp.ones((4, 4))}},
    }
    tx = build_optimizer(params, learning_rate=0.1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["detector"]["stem_bn"]["scale"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["detector"]["stem_bn"]["bias"]), 0.0)
    # frozen_stages=1 (default, mmdet semantics): stem conv + layer1 pinned
    np.testing.assert_array_equal(
        np.asarray(updates["detector"]["stem_conv"]["kernel"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(updates["detector"]["layer1_block0"]["conv1"]["kernel"]), 0.0)
    # layer2 onwards fine-tunes (at lr * lr_decay), and the head at full lr
    assert float(jnp.abs(updates["detector"]["layer2_block0"]["conv1"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["head"]["fc"]["kernel"]).max()) > 0

    # frozen_stages=-1 trains everything except FrozenBN affine terms
    tx_all = build_optimizer(params, learning_rate=0.1, frozen_stages=-1)
    upd_all, _ = tx_all.update(grads, tx_all.init(params), params)
    assert float(jnp.abs(upd_all["detector"]["stem_conv"]["kernel"]).max()) > 0
    assert float(jnp.abs(upd_all["detector"]["layer1_block0"]["conv1"]["kernel"]).max()) > 0
