"""torch->flax ResNet-50 conversion: synthetic torch-layout state dict."""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu.models.backbone import load_torch_resnet50
from skghoi_tpu.models.resnet import ResNet50


def build_torch_style_state_dict(rng):
    """Random tensors with torchvision resnet50 names/shapes (conv [O,I,kh,kw])."""
    sd = {}

    def conv(name, o, i, k):
        scale = 1.0 / np.sqrt(i * k * k)  # keep activations bounded through 50 layers
        sd[name + ".weight"] = (rng.normal(size=(o, i, k, k)) * scale).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    in_ch = 64
    for si, (blocks, w) in enumerate(zip(stage_sizes, widths)):
        for b in range(blocks):
            base = f"layer{si + 1}.{b}"
            conv(base + ".conv1", w, in_ch, 1)
            bn(base + ".bn1", w)
            conv(base + ".conv2", w, w, 3)
            bn(base + ".bn2", w)
            conv(base + ".conv3", w * 4, w, 1)
            bn(base + ".bn3", w * 4)
            if b == 0:
                conv(base + ".downsample.0", w * 4, in_ch, 1)
                bn(base + ".downsample.1", w * 4)
            in_ch = w * 4
    return sd


def test_conversion_shapes_and_forward():
    rng = np.random.default_rng(0)
    sd = build_torch_style_state_dict(rng)
    params, stats = load_torch_resnet50(sd)

    model = ResNet50()
    x = jnp.zeros((1, 64, 64, 3))
    init_vars = model.init(jax.random.PRNGKey(0), x)

    # Converted trees must match the flax init structure exactly.
    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: np.asarray(a).shape, tree)

    assert shapes(init_vars["params"]) == shapes(params)
    assert shapes(init_vars["batch_stats"]) == shapes(stats)

    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert len(out) == 4
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out)
    # Converted conv kernels are transposed, not copied wholesale.
    np.testing.assert_allclose(
        np.asarray(params["stem_conv"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
