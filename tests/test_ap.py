"""AP meters and box-pair association vs hand-computed values."""

import numpy as np

from skghoi_tpu.ops.ap import (
    BoxPairAssociation,
    DetectionAPMeter,
    average_precision,
)


def test_perfect_ranking_ap_is_one():
    scores = np.asarray([0.9, 0.8, 0.7, 0.2, 0.1])
    labels = np.asarray([1, 1, 1, 0, 0])
    np.testing.assert_allclose(
        average_precision(scores, labels, num_gt=3, algorithm="11P"), 1.0, rtol=1e-12
    )
    np.testing.assert_allclose(
        average_precision(scores, labels, num_gt=3, algorithm="INT"), 1.0, rtol=1e-12
    )


def test_known_11p_value():
    # One TP at rank 1, one FP at rank 2, one TP at rank 3; num_gt = 2.
    scores = np.asarray([0.9, 0.8, 0.7])
    labels = np.asarray([1, 0, 1])
    # recalls: .5, .5, 1.0 ; precisions: 1, .5, 2/3
    # 11P: thresholds 0..0.5 -> max prec 1.0 (6 pts), 0.6..1.0 -> 2/3 (5 pts)
    want = (6 * 1.0 + 5 * (2 / 3)) / 11
    got = average_precision(scores, labels, num_gt=2, algorithm="11P")
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_int_matches_manual_area():
    scores = np.asarray([0.9, 0.8, 0.7])
    labels = np.asarray([1, 0, 1])
    # PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3); envelope at r in
    # (0,.5] -> 1.0, (.5,1] -> 2/3
    want = 0.5 * 1.0 + 0.5 * (2 / 3)
    got = average_precision(scores, labels, num_gt=2, algorithm="INT")
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_missed_gt_lowers_recall():
    scores = np.asarray([0.9])
    labels = np.asarray([1.0])
    # 1 TP but 2 GT: recall caps at 0.5 -> 11P = 6/11
    got = average_precision(scores, labels, num_gt=2, algorithm="11P")
    np.testing.assert_allclose(got, 6 / 11, rtol=1e-9)


def test_meter_routes_classes():
    m = DetectionAPMeter(3, num_gt=[1, 1, 1], algorithm="11P")
    m.append([0.9, 0.8], [0, 1], [1, 0])
    m.append([0.7], [1], [1])
    ap = m.eval()
    np.testing.assert_allclose(ap[0], 1.0, rtol=1e-12)
    assert 0 < ap[1] < 1.0
    assert ap[2] == 0.0


def test_box_pair_association_greedy():
    assoc = BoxPairAssociation(min_iou=0.5)
    gt_h = np.asarray([[0, 0, 10, 10.0]])
    gt_o = np.asarray([[20, 0, 30, 10.0]])
    det_h = np.asarray([[0, 0, 10, 10.0], [1, 0, 11, 10.0], [50, 50, 60, 60.0]])
    det_o = np.asarray([[20, 0, 30, 10.0], [21, 0, 31, 10.0], [70, 70, 80, 80.0]])
    scores = np.asarray([0.6, 0.9, 0.5])
    labels = assoc((gt_h, gt_o), (det_h, det_o), scores)
    # The higher-scored overlapping detection (index 1) claims the single GT.
    assert labels.tolist() == [0.0, 1.0, 0.0]


def test_association_empty_gt():
    assoc = BoxPairAssociation()
    labels = assoc(
        (np.zeros((0, 4)), np.zeros((0, 4))),
        (np.ones((2, 4)), np.ones((2, 4))),
        np.asarray([0.5, 0.4]),
    )
    assert labels.tolist() == [0.0, 0.0]
