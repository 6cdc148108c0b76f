"""remat_stages must be numerically transparent: identical parameter tree,
identical forward outputs, identical gradients — only the backward's memory
schedule changes (activations recomputed instead of stored)."""

import jax
import jax.numpy as jnp
import numpy as np

from skghoi_tpu.models.resnet import ResNet50


def test_remat_transparent_forward_and_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)), jnp.float32)
    base = ResNet50(stage_sizes=(1, 1, 1, 1), frozen_stages=-1)
    rem = ResNet50(stage_sizes=(1, 1, 1, 1), frozen_stages=-1, remat_stages=2)

    variables = base.init(jax.random.PRNGKey(0), x)
    # Same parameter tree: the remat wrapper must not rename anything.
    v2 = rem.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    def loss(mod):
        def f(params):
            outs = mod.apply({"params": params, **extra}, x)
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    extra = {k: v for k, v in variables.items() if k != "params"}
    params = variables["params"]
    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rem))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert p0 == p1
        # Recomputed activations go through different XLA fusions, so exact
        # bitwise equality is not guaranteed — only reassociation-level noise.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-4, err_msg=str(p0))
