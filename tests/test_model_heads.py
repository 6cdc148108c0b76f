"""GraphHead/InteractionHead numerics: MBF equivalence, filtering, association."""

import numpy as np
import jax
import jax.numpy as jnp

from skghoi_tpu import constants as C
from skghoi_tpu.models import MultiBranchFusion, filter_detections
from skghoi_tpu.models.graph_head import GraphHead, masked_softmax
from skghoi_tpu.data.structures import HOITargets


def test_mbf_matches_per_branch_loop():
    """The fused einsum must equal the reference's per-branch Linear loop:
    relu(sum_k fc3_k(relu(fc1_k(a) * fc2_k(s))))  (heads/...head.py:469-474)."""
    A, S, R, K = 12, 10, 32, 4
    m = MultiBranchFusion(A, S, R, K)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (5, A))
    s = jax.random.normal(jax.random.PRNGKey(1), (5, S))
    params = m.init(key, a, s)
    got = np.asarray(m.apply(params, a, s))

    p = params["params"]
    w1, b1 = np.asarray(p["w1"]), np.asarray(p["b1"])
    w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
    w3, b3 = np.asarray(p["w3"]), np.asarray(p["b3"])
    an, sn = np.asarray(a), np.asarray(s)
    acc = np.zeros((5, R))
    for k in range(K):
        f1 = an @ w1[k] + b1[k]
        f2 = sn @ w2[k] + b2[k]
        acc += np.maximum(f1 * f2, 0) @ w3[k] + b3[k]
    want = np.maximum(acc, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_softmax_zero_on_empty_rows():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    mask = jnp.asarray([[True, True, False], [False, False, False]])
    out = np.asarray(masked_softmax(logits, mask, axis=1))
    np.testing.assert_allclose(out[0], [np.exp(1) / (np.exp(1) + np.exp(2)), np.exp(2) / (np.exp(1) + np.exp(2)), 0.0], rtol=1e-5)
    np.testing.assert_allclose(out[1], 0.0)
    assert np.isfinite(out).all()


def _dets(rows):
    """rows: (x1, score, label) -> non-overlapping unit boxes at x1."""
    boxes = jnp.asarray([[x, 0.0, x + 10.0, 10.0] for x, _, _ in rows])
    scores = jnp.asarray([s for _, s, _ in rows])
    labels = jnp.asarray([l for _, _, l in rows])
    valid = jnp.ones(len(rows), bool)
    return boxes[None], labels[None], scores[None], valid[None]


def test_filter_detections_thresh_sort_and_human_packing():
    human = C.HICO_HUMAN_IDX
    rows = [
        (0, 0.9, 3),        # object, highest
        (20, 0.1, 3),       # below threshold -> dropped
        (40, 0.5, human),   # human
        (60, 0.7, human),   # human, higher
        (80, 0.3, 7),       # object
    ]
    b, l, s, v = _dets(rows)
    out = filter_detections(b, l, s, v)
    n_h, n = int(out.n_h[0]), int(out.n[0])
    assert (n_h, n) == (2, 4)
    # humans first, by score: 0.7 then 0.5
    np.testing.assert_allclose(np.asarray(out.scores[0, :n]), [0.7, 0.5, 0.9, 0.3])
    assert out.labels[0, :2].tolist() == [human, human]
    assert out.labels[0, 2:4].tolist() == [3, 7]


def test_filter_detections_nms_suppresses_duplicates():
    human = C.HICO_HUMAN_IDX
    boxes = jnp.asarray([[[0.0, 0.0, 10.0, 10.0], [0.5, 0.0, 10.5, 10.0], [0.0, 0.0, 10.0, 10.0]]])
    labels = jnp.asarray([[3, 3, 5]])  # two same-class near-duplicates + one other class
    scores = jnp.asarray([[0.9, 0.8, 0.7]])
    valid = jnp.ones((1, 3), bool)
    out = filter_detections(boxes, labels, scores, valid)
    assert int(out.n[0]) == 2  # duplicate of class 3 suppressed, class 5 kept
    np.testing.assert_allclose(np.asarray(out.scores[0, :2]), [0.9, 0.7])


def test_filter_detections_caps_at_max():
    human = C.HICO_HUMAN_IDX
    m = 50
    boxes = jnp.asarray([[ [100.0 * i, 0.0, 100.0 * i + 10.0, 10.0] for i in range(m)]])
    labels = jnp.full((1, m), human)
    scores = jnp.asarray(np.linspace(0.99, 0.3, m)[None])
    out = filter_detections(boxes, labels, jnp.asarray(scores, jnp.float32), jnp.ones((1, m), bool))
    assert int(out.n_h[0]) == C.MAX_HUMAN
    assert int(out.n[0]) == C.MAX_HUMAN  # all humans, no objects
    # kept the top-scoring 15
    np.testing.assert_allclose(np.asarray(out.scores[0, :15]), scores[0, :15], rtol=1e-6)


def test_filter_detections_appends_gt_in_training():
    human = C.HICO_HUMAN_IDX
    b, l, s, v = _dets([(0, 0.5, 3)])
    targets = {
        "boxes_h": jnp.asarray([[[200.0, 0.0, 210.0, 10.0]]]),
        "boxes_o": jnp.asarray([[[300.0, 0.0, 310.0, 10.0]]]),
        "object": jnp.asarray([[12]]),
        "labels": jnp.asarray([[5]]),
        "valid": jnp.ones((1, 1), bool),
    }
    out = filter_detections(b, l, s, v, targets=targets)
    assert (int(out.n_h[0]), int(out.n[0])) == (1, 3)
    # GT human first with score 1.0; objects: GT object (1.0) then detection (0.5)
    np.testing.assert_allclose(np.asarray(out.scores[0, :3]), [1.0, 1.0, 0.5])
    assert out.labels[0, :3].tolist() == [human, 12, 3]


def test_gt_association_min_iou():
    gh = GraphHead(max_humans=2)
    boxes = jnp.zeros((1, 4, 4))
    boxes = boxes.at[0, 0].set(jnp.asarray([0, 0, 10, 10.0]))   # human slot 0
    boxes = boxes.at[0, 1].set(jnp.asarray([100, 0, 110, 10.0]))  # human slot 1 (no match)
    boxes = boxes.at[0, 2].set(jnp.asarray([20, 0, 30, 10.0]))  # object matching gt_o
    boxes = boxes.at[0, 3].set(jnp.asarray([50, 0, 60, 10.0]))
    targets = {
        "boxes_h": jnp.asarray([[[1.0, 0, 10, 10]]]),  # IoU with slot0 ~ 0.82
        "boxes_o": jnp.asarray([[[20.0, 0, 30, 10]]]),
        "object": jnp.asarray([[7]]),
        "labels": jnp.asarray([[42]]),
        "valid": jnp.ones((1, 1), bool),
    }
    labels = gh.associate_with_ground_truth(boxes, targets)
    assert labels.shape == (1, 2, 4, C.HICO_NUM_VERBS)
    got = np.asarray(labels[0])
    assert got[0, 2, 42] == 1.0  # (human0, object2) matched verb 42
    assert got.sum() == 1.0  # and nothing else


def test_prior_power_train_vs_eval():
    """Detection-score exponent: 1.0 in training, 2.8 at eval (head.py:742)."""
    import jax.numpy as jnp

    gh = GraphHead(max_humans=2)
    scores = jnp.asarray([[0.5, 0.6, 0.7]])
    labels = jnp.asarray([[C.HICO_HUMAN_IDX, 3, 5]])
    ovm = jnp.ones((80, C.HICO_NUM_VERBS), jnp.float32)
    p_train = gh.compute_prior_scores(scores, labels, ovm, training=True)
    p_eval = gh.compute_prior_scores(scores, labels, ovm, training=False)
    np.testing.assert_allclose(float(p_train[0, 0, 0, 1, 0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(p_eval[0, 0, 0, 1, 0]), 0.5**2.8, rtol=1e-5)
    # prior_o uses the object box's score
    np.testing.assert_allclose(float(p_train[0, 1, 0, 1, 0]), 0.6, rtol=1e-6)


def test_transh_sampler_reports_truncated_positives():
    """More positives than max_transh_pairs -> transh_pos_dropped counts the
    overflow (the reference samples ALL positives, head.py:936-943; the cap
    keeps shapes static, so the truncation must at least be visible)."""
    import jax
    import jax.numpy as jnp

    from skghoi_tpu.models.graph_head import GraphHead

    gh = GraphHead(max_transh_pairs=4)
    b, h, n, k = 1, 3, 5, gh.num_cls
    scores = jnp.zeros((b, h * n * k))
    labels = jnp.zeros((b, h, n, k)).at[:, :, :, :2].set(1.0)  # 30 positives
    pair_valid = jnp.ones((b, h, n), bool)
    pos, neg, mask, dropped = gh._sample_transh_pairs(
        jax.random.PRNGKey(0), scores.reshape(b, h, n, k), labels, pair_valid
    )
    assert pos.shape == (b, 4) and int(mask.sum()) == 4
    assert float(dropped) == 3 * 5 * 2 - 4
