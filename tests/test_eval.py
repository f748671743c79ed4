"""VOC mAP evaluation tests against hand-computed cases."""

import numpy as np
import pytest

from tfssd_tpu.evaluate import (
    average_precision,
    detections_from_nms_result,
    evaluate_predictions,
)


def _gt(boxes, labels, difficult=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels, np.int32)
    if difficult is None:
        difficult = np.zeros(len(labels), bool)
    return {"boxes": boxes, "labels": labels,
            "difficult": np.asarray(difficult, bool)}


def _det(boxes, scores, classes):
    return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "scores": np.asarray(scores, np.float32),
            "classes": np.asarray(classes, np.int32)}


BOX = [0.1, 0.1, 0.5, 0.5]
BOX2 = [0.6, 0.6, 0.9, 0.9]
FAR = [0.0, 0.6, 0.2, 0.9]


def test_perfect_detection():
    res = evaluate_predictions(
        [_gt([BOX], [1])], [_det([BOX], [0.9], [1])],
        num_classes=1, verbose=False)
    assert res["map"] == pytest.approx(1.0)


def test_miss_and_false_positive():
    # One gt, one detection that misses -> AP 0.
    res = evaluate_predictions(
        [_gt([BOX], [1])], [_det([FAR], [0.9], [1])],
        num_classes=1, verbose=False)
    assert res["map"] == pytest.approx(0.0)


def test_duplicate_detection_is_fp():
    # Two detections on the same gt: second is a false positive.
    res = evaluate_predictions(
        [_gt([BOX], [1])],
        [_det([BOX, BOX], [0.9, 0.8], [1, 1])],
        num_classes=1, verbose=False)
    # recall reaches 1.0 at precision 1.0 first -> 11-pt AP stays 1.0
    assert res["map"] == pytest.approx(1.0)


def test_half_recall():
    # Two gts, one detected -> recall 0.5, precision 1 -> 11-pt AP ~ 6/11.
    res = evaluate_predictions(
        [_gt([BOX, BOX2], [1, 1])],
        [_det([BOX], [0.9], [1])],
        num_classes=1, verbose=False)
    assert res["map"] == pytest.approx(6 / 11, abs=1e-6)


def test_difficult_ignored():
    # Difficult gt: detection on it is ignored (not FP), and it doesn't
    # count toward npos.
    res = evaluate_predictions(
        [_gt([BOX, BOX2], [1, 1], difficult=[False, True])],
        [_det([BOX, BOX2], [0.9, 0.8], [1, 1])],
        num_classes=1, verbose=False)
    assert res["map"] == pytest.approx(1.0)


def test_multiclass_and_nan_classes():
    res = evaluate_predictions(
        [_gt([BOX], [1]), _gt([BOX2], [2])],
        [_det([BOX], [0.9], [1]), _det([BOX2], [0.8], [2])],
        num_classes=3, verbose=False)
    assert res["ap"][1] == pytest.approx(1.0)
    assert res["ap"][2] == pytest.approx(1.0)
    assert np.isnan(res["ap"][3])  # no gt of class 3
    assert res["map"] == pytest.approx(1.0)


def test_ap_integration_modes():
    recall = np.asarray([0.5, 1.0])
    precision = np.asarray([1.0, 0.5])
    ap07 = average_precision(recall, precision, use_07_metric=True)
    apc = average_precision(recall, precision, use_07_metric=False)
    assert ap07 == pytest.approx((6 * 1.0 + 5 * 0.5) / 11)
    assert apc == pytest.approx(0.75)


def test_detections_from_nms_result():
    class R:
        boxes = np.zeros((2, 5, 4))
        scores = np.zeros((2, 5))
        classes = np.zeros((2, 5), np.int32)

    dets = detections_from_nms_result(R())
    assert len(dets) == 2 and dets[0]["boxes"].shape == (5, 4)
    assert len(detections_from_nms_result(R(), num_valid=1)) == 1
