"""Pallas RoIAlign (interpreter mode) vs the gather-based XLA reference."""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu.ops.pallas_roi_align import pallas_multiscale_roi_align
from skghoi_tpu.ops.roi_align import multiscale_roi_align


def make_fixture(seed=0, b=2, n=6, canvas=(256, 384)):
    rng = np.random.default_rng(seed)
    fms = [
        jnp.asarray(rng.normal(size=(b, canvas[0] // s, canvas[1] // s, 8)).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    xy = rng.uniform(0, 200, (b, n, 2))
    wh = rng.uniform(8, 150, (b, n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    return fms, boxes


def test_matches_gather_reference():
    fms, boxes = make_fixture()
    want = jax.vmap(lambda f, bx: multiscale_roi_align(f, bx))(tuple(fms), boxes)
    got = pallas_multiscale_roi_align(tuple(fms), boxes, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_edge_boxes():
    fms, _ = make_fixture()
    boxes = jnp.asarray(
        [
            [
                [0.0, 0.0, 383.0, 255.0],      # whole image -> coarsest level
                [-20.0, -20.0, 30.0, 30.0],    # partially outside
                [370.0, 240.0, 383.0, 255.0],  # bottom-right corner
                [5.0, 5.0, 6.0, 6.0],          # tiny -> clamped roi
                [0.0, 0.0, 0.0, 0.0],          # degenerate (padding slot)
                [100.0, 50.0, 220.0, 200.0],
            ]
        ]
        * 2
    )
    want = jax.vmap(lambda f, bx: multiscale_roi_align(f, bx))(tuple(fms), boxes)
    got = pallas_multiscale_roi_align(tuple(fms), boxes, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_custom_backward_matches_gather_grad():
    from skghoi_tpu.ops.pallas_roi_align import _roi_backward

    fms, boxes = make_fixture(b=1, n=4)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=(1, 4, 7, 7, 8)).astype(np.float32))

    def loss(f):
        out = jax.vmap(lambda ff, bx: multiscale_roi_align(ff, bx))(f, boxes)
        return jnp.sum(out * g)

    want = jax.grad(loss)(tuple(fms))
    got = _roi_backward(tuple(fms), boxes, g)
    for l, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                                   err_msg=f"level {l}")
