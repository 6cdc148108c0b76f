"""AdaMixer decoder: box parameterization, 3D sampling + adaptive mixing vs
the torch oracle, converter round-trip, and a single-box overfit.

The reference's stage 1 is an AdaMixer built from an absent mmdet config
(``models/adamixer_transH_spatial_r50_models.py:144-157``); these tests pin
our Flax implementation of the public architecture against an independent
torch twin (the same oracle pattern as ``tests/test_reference_parity.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from skghoi_tpu.detect.adamixer import (
    AdaMixerDetector,
    AdaMixerOutputs,
    AdaptiveMixing,
    apply_deltas,
    box_to_xyzr,
    compute_assignments,
    sample_3d,
    set_loss,
    xyzr_to_box,
)
from skghoi_tpu.detect.adamixer_convert import load_torch_mixing
from skghoi_tpu.oracle.adamixer import (
    AdaptiveMixingTorch,
    sample_3d_torch,
    xyzr_to_box_torch,
)


def test_xyzr_box_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(10, 100, (20, 2))
    wh = rng.uniform(4, 60, (20, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    rec = xyzr_to_box(box_to_xyzr(boxes))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), rtol=1e-5, atol=1e-3)
    # torch twin agrees
    rec_t = xyzr_to_box_torch(torch.tensor(np.asarray(box_to_xyzr(boxes))))
    np.testing.assert_allclose(rec_t.numpy(), np.asarray(boxes), rtol=1e-5, atol=1e-3)


def test_apply_deltas_moves_in_box_units():
    xyzr = box_to_xyzr(jnp.asarray([[10.0, 20.0, 50.0, 40.0]]))  # w=40, h=20
    out = xyzr_to_box(apply_deltas(xyzr, jnp.asarray([[0.5, 0.0, 0.0, 0.0]])))
    np.testing.assert_allclose(
        np.asarray(out[0]), [30.0, 20.0, 70.0, 40.0], atol=1e-3
    )


def test_sample_3d_matches_torch_oracle():
    rng = np.random.default_rng(1)
    b, n, g, p, c = 2, 5, 2, 7, 8
    canvas = (64, 96)
    pyr_np = [
        rng.standard_normal((b, canvas[0] // s, canvas[1] // s, c)).astype(np.float32)
        for s in (4, 8, 16, 32)
    ]
    pts = np.stack(
        [
            rng.uniform(-5, canvas[1] + 5, (b, n, g, p)),  # x, incl. out-of-bounds
            rng.uniform(-5, canvas[0] + 5, (b, n, g, p)),
            rng.uniform(1.5, 5.5, (b, n, g, p)),  # z across and beyond levels
        ],
        axis=-1,
    ).astype(np.float32)
    ours = sample_3d([jnp.asarray(f) for f in pyr_np], jnp.asarray(pts))
    ref = sample_3d_torch([torch.tensor(f) for f in pyr_np], torch.tensor(pts))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_adaptive_mixing_matches_converted_torch():
    """Pins ``adamixer_convert.load_torch_mixing`` against the torch oracle's
    state-dict layout.  NB: this (and the module it tests) can never be
    exercised against a *real* mmdet AdaMixer checkpoint in this environment
    (zero egress, none vendored); the oracle replicates the official module's
    parameter naming, which is the strongest evidence available here."""
    torch.manual_seed(0)
    rng = np.random.default_rng(2)
    b, n, g, p_in, p_out, c = 2, 4, 2, 5, 6, 16
    twin = AdaptiveMixingTorch(content_dim=c, groups=g, in_points=p_in, out_points=p_out)
    query = rng.standard_normal((b, n, c)).astype(np.float32)
    values = rng.standard_normal((b, n, g, p_in, c // g)).astype(np.float32)

    with torch.no_grad():
        want = twin(torch.tensor(query), torch.tensor(values)).numpy()

    params = jax.tree_util.tree_map(
        jnp.asarray, load_torch_mixing(twin.state_dict())
    )
    mod = AdaptiveMixing(content_dim=c, groups=g, in_points=p_in, out_points=p_out)
    got = mod.apply({"params": params}, jnp.asarray(query), jnp.asarray(values))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _tiny_detector():
    return AdaMixerDetector(
        num_classes=80, num_queries=12, num_stages=2, content_dim=64,
        groups=2, in_points=4, out_points=8, ffn_dim=128,
    )


def test_decoder_shapes_and_finite():
    model = _tiny_detector()
    images = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    out = model.init_with_output(jax.random.PRNGKey(0), images)[0]
    assert out.cls_logits.shape == (2, 2, 12, 80)
    assert out.boxes.shape == (2, 2, 12, 4)
    assert np.isfinite(np.asarray(out.boxes)).all()
    # initial-stage boxes stay near the canvas
    assert (np.asarray(out.boxes[..., 2]) < 96 * 4).all()


@pytest.mark.slow
def test_adamixer_overfits_one_box():
    """Hungarian-matched set loss on one image localizes the single GT box."""
    import optax

    model = _tiny_detector()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[20.0, 16.0, 60.0, 48.0]]])
    gt_labels = jnp.asarray([[7]])
    gt_valid = jnp.ones((1, 1), bool)
    hw = (64.0, 96.0)

    variables = dict(model.init(jax.random.PRNGKey(0), images))
    params = variables.pop("params")
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    fwd = jax.jit(lambda p: model.apply({"params": p, **variables}, images))

    @jax.jit
    def step(params, opt_state, assignments):
        def loss_fn(p):
            out = model.apply({"params": p, **variables}, images)
            return set_loss(out, assignments, gt_boxes, gt_labels, gt_valid, hw)["set_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(120):
        out = fwd(params)
        assignments = jnp.asarray(
            compute_assignments(out, gt_boxes, gt_labels, gt_valid, hw)
        )
        params, opt_state, loss = step(params, opt_state, assignments)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.5, (first, final)

    out = fwd(params)
    logits = np.asarray(out.cls_logits[-1, 0])  # last stage
    boxes = np.asarray(out.boxes[-1, 0])
    best = int(np.argmax(logits.max(axis=1)))
    bb = boxes[best]
    gt = np.asarray(gt_boxes[0, 0])
    ix1, iy1 = max(bb[0], gt[0]), max(bb[1], gt[1])
    ix2, iy2 = min(bb[2], gt[2]), min(bb[3], gt[3])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = (
        (bb[2] - bb[0]) * (bb[3] - bb[1]) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter
    )
    iou = inter / union
    assert iou > 0.5, (bb, gt, iou)
    assert int(np.argmax(logits[best])) == 7


def test_adamixer_detector_fn_end_to_end(tmp_path):
    """The stage-1 generation pipeline (adamixer_preprocessing.py:43-58
    counterpart): detector fn -> per-image JSON cache."""
    from skghoi_tpu.detect.generate import generate_model_detections
    from skghoi_tpu.tools.preprocess_detections import build_adamixer_detector_fn

    rng = np.random.default_rng(3)
    model = _tiny_detector()
    img0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0)
    detector = build_adamixer_detector_fn(
        variables, score_thresh=0.0, min_size=48, max_size=96, canvas=(64, 96),
        num_queries=12, num_stages=2, content_dim=64, groups=2,
        in_points=4, out_points=8, ffn_dim=128,
    )

    class FakeDataset:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8), None)

        def filename(self, i):
            return "img.jpg"

    cache = tmp_path / "cache"
    generate_model_detections(detector, FakeDataset(), str(cache), score_thresh=0.0)
    import json

    with open(cache / "img.json") as f:
        blob = json.load(f)
    assert len(blob["boxes"]) == len(blob["labels"]) == len(blob["scores"]) > 0
    assert all(0 <= s <= 1 for s in blob["scores"])


def test_adaptive_mixing_grads_nonzero_at_init():
    """Regression for the dead-block init: with zero kernel AND zero bias on
    both generators the mixing matrices are identically zero and
    relu(LayerNorm(0)) kills every gradient (verified: all grads except
    out_proj.bias were exactly 0.0 and stayed 0.0 over 20 SGD steps).  The
    generators' biases must start nonzero (torch Linear default)."""
    rng = np.random.default_rng(4)
    b, n, g, p_in, p_out, c = 2, 3, 2, 4, 6, 16
    mod = AdaptiveMixing(content_dim=c, groups=g, in_points=p_in, out_points=p_out)
    query = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((b, n, g, p_in, c // g)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), query, values)

    def loss(params, q, v):
        return jnp.sum(mod.apply({"params": params}, q, v) ** 2)

    grads, gq, gv = jax.grad(loss, argnums=(0, 1, 2))(variables["params"], query, values)
    for name in ("channel_mixer", "spatial_mixer"):
        gk = np.asarray(grads[name]["kernel"])
        assert np.abs(gk).max() > 0, f"{name} kernel grad identically zero at init"
    # and the sampled-values path is alive (the operator can actually mix).
    # NB the *query* grad is legitimately zero at init (both generator
    # kernels are zero by the SparseRCNN convention); it becomes nonzero
    # after the first update, which the kernel-grad assertions guarantee.
    assert np.abs(np.asarray(gv)).max() > 0, "no gradient flows through values"
    del gq


def _brute_force_min_cost(cost):
    """Min-cost assignment over all query-permutations (oracle for tiny N)."""
    import itertools

    n, g = cost.shape
    best = None
    for perm in itertools.permutations(range(n), g):
        c = sum(cost[q, i] for i, q in enumerate(perm))
        if best is None or c < best[0]:
            best = (c, perm)
    return best


def test_hungarian_match_multiobject_optimal_and_unique():
    """4 GT boxes, 7 queries: assignment is injective and cost-optimal vs a
    brute-force oracle (VERDICT r3 #7; ref family behavior main_detr.py's
    HungarianMatcher)."""
    rng = np.random.default_rng(5)
    from skghoi_tpu.detect.adamixer import hungarian_match

    for trial in range(10):
        cost = rng.standard_normal((7, 4)).astype(np.float32)
        assign = hungarian_match(cost, np.ones(4, bool))
        # injective: no query used twice
        assert len(set(assign.tolist())) == 4, assign
        got = sum(cost[assign[i], i] for i in range(4))
        want, _ = _brute_force_min_cost(cost)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hungarian_match_validity_holes():
    """A gt_valid mask with holes must pair each *valid* GT with the query
    minimizing the cost over valid columns only (no contiguous-prefix
    assumption)."""
    from skghoi_tpu.detect.adamixer import hungarian_match

    rng = np.random.default_rng(6)
    cost = rng.standard_normal((6, 5)).astype(np.float32)
    valid = np.array([True, False, True, False, True])
    assign = hungarian_match(cost, valid)
    assert (assign[~valid] == -1).all()
    sub = cost[:, np.flatnonzero(valid)]
    want, perm = _brute_force_min_cost(sub)
    got = sum(cost[assign[i], i] for i in np.flatnonzero(valid))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # matches the dense-mask result on the compacted problem
    compact = hungarian_match(sub, np.ones(3, bool))
    np.testing.assert_array_equal(assign[valid], compact)


def test_set_loss_ignores_unmatched_valid_gt():
    """When valid GTs exceed num_queries, the unmatched GT keeps assign=-1 and
    must contribute NO box loss: perturbing its coordinates wildly leaves the
    loss unchanged."""
    s, b, n, k, g = 1, 1, 2, 5, 3  # 2 queries, 3 valid GTs
    rng = np.random.default_rng(7)
    xy = rng.uniform(0, 40, (s, b, n, 2))
    wh = rng.uniform(4, 20, (s, b, n, 2))
    out = AdaMixerOutputs(
        cls_logits=jnp.asarray(rng.standard_normal((s, b, n, k)), jnp.float32),
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32),
    )
    gt_labels = jnp.asarray([[1, 2, 3]])
    gt_valid = jnp.ones((1, g), bool)
    hw = (64.0, 96.0)
    assign = jnp.asarray([[[0, 1, -1]]])  # GT 2 unmatched

    base_boxes = jnp.asarray([[[5.0, 5, 20, 20], [30, 30, 50, 50], [1, 1, 2, 2]]])
    moved_boxes = base_boxes.at[0, 2].set(jnp.asarray([500.0, 500, 900, 900]))
    l0 = float(set_loss(out, assign, base_boxes, gt_labels, gt_valid, hw)["set_loss"])
    l1 = float(set_loss(out, assign, moved_boxes, gt_labels, gt_valid, hw)["set_loss"])
    assert np.isfinite(l0)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
