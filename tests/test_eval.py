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


def test_map_matches_independent_naive_implementation():
    # Property fuzz: evaluate_predictions vs a from-scratch naive VOC
    # evaluator written independently (plain loops, own 11-point
    # interpolation). Random scenes with jittered true detections,
    # spurious detections, difficult gts and empty images.
    def naive_map(gts, dets, num_classes, iou_t=0.5):
        def iou(a, b):
            iy0, ix0 = max(a[0], b[0]), max(a[1], b[1])
            iy1, ix1 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(iy1 - iy0, 0.0) * max(ix1 - ix0, 0.0)
            area = lambda r: max(r[2] - r[0], 0.0) * max(r[3] - r[1], 0.0)
            u = area(a) + area(b) - inter
            return inter / u if u > 0 else 0.0

        aps = []
        for cls in range(1, num_classes + 1):
            npos = 0
            used = {}
            for i, gt in enumerate(gts):
                idxs = [j for j, l in enumerate(gt["labels"]) if l == cls]
                used[i] = {j: False for j in idxs}
                npos += sum(1 for j in idxs if not gt["difficult"][j])
            rows = []
            for i, det in enumerate(dets):
                for b, s, c in zip(det["boxes"], det["scores"],
                                   det["classes"]):
                    if c == cls and s > 0:
                        rows.append((float(s), i, [float(x) for x in b]))
            rows.sort(key=lambda r: -r[0])
            tps, fps = [], []
            for s, i, box in rows:
                cand = [(j, iou(box, [float(x) for x in gts[i]["boxes"][j]]))
                        for j in used[i]]
                best_j, best_iou = -1, -1.0
                for j, o in cand:
                    if o > best_iou:
                        best_j, best_iou = j, o
                if best_iou >= iou_t:
                    if gts[i]["difficult"][best_j]:
                        continue
                    if used[i][best_j]:
                        tps.append(0); fps.append(1)
                    else:
                        used[i][best_j] = True
                        tps.append(1); fps.append(0)
                else:
                    tps.append(0); fps.append(1)
            if npos == 0:
                continue
            ap, tp_c, fp_c = 0.0, 0, 0
            prec_rec = []
            for t, f in zip(tps, fps):
                tp_c += t; fp_c += f
                prec_rec.append((tp_c / (tp_c + fp_c), tp_c / npos))
            for thr in [k / 10.0 for k in range(11)]:
                best = 0.0
                for p, r in prec_rec:
                    if r >= thr - 1e-12 and p > best:
                        best = p
                ap += best / 11.0
            aps.append(ap)
        return sum(aps) / len(aps) if aps else 0.0

    rng = np.random.default_rng(0)
    for trial in range(8):
        n_img, n_cls = 6, 4
        gts, dets = [], []
        for _ in range(n_img):
            g = int(rng.integers(0, 5))
            boxes, labels, diff = [], [], []
            for _ in range(g):
                y0, x0 = rng.uniform(0, 0.6, 2)
                h, w = rng.uniform(0.15, 0.35, 2)
                boxes.append([y0, x0, min(y0 + h, 1), min(x0 + w, 1)])
                labels.append(int(rng.integers(1, n_cls + 1)))
                diff.append(bool(rng.uniform() < 0.2))
            gts.append({"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                        "labels": np.asarray(labels, np.int32),
                        "difficult": np.asarray(diff, bool)})
            dboxes, dscores, dcls = [], [], []
            for b, l in zip(boxes, labels):
                if rng.uniform() < 0.8:  # jittered true detection
                    jit = rng.uniform(-0.03, 0.03, 4)
                    dboxes.append(np.clip(np.asarray(b) + jit, 0, 1))
                    dscores.append(float(rng.uniform(0.3, 1.0)))
                    dcls.append(l if rng.uniform() < 0.85
                                else int(rng.integers(1, n_cls + 1)))
            for _ in range(int(rng.integers(0, 3))):  # spurious
                y0, x0 = rng.uniform(0, 0.7, 2)
                dboxes.append([y0, x0, y0 + 0.2, x0 + 0.2])
                dscores.append(float(rng.uniform(0.05, 0.9)))
                dcls.append(int(rng.integers(1, n_cls + 1)))
            dets.append({"boxes": np.asarray(dboxes,
                                             np.float32).reshape(-1, 4),
                         "scores": np.asarray(dscores, np.float32),
                         "classes": np.asarray(dcls, np.int32)})
        got = evaluate_predictions(gts, dets, num_classes=n_cls,
                                   verbose=False)["map"]
        want = naive_map(gts, dets, n_cls)
        assert abs(got - want) < 1e-9, (trial, got, want)
