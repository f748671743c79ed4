"""tools/parity_vs_reference.py — the pre-built SURVEY §4 item 7 harness.

The real comparison is blocked until /root/reference is populated; these
tests prove the machinery end-to-end with a mocked reference (a ported
Keras trunk) plus pure-numpy comparator cases, so the standing order in
SURVEY.md §0 is one command the moment the mount appears.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_vs_reference as pvr  # noqa: E402


def _dets(n=6, seed=0, cls_hi=5):
    rng = np.random.default_rng(seed)
    boxes = np.sort(rng.uniform(0, 1, (n, 2, 2)), axis=1).reshape(n, 4)
    return {"boxes": boxes, "scores": np.linspace(0.9, 0.4, n),
            "classes": rng.integers(1, cls_hi, n)}


def test_comparator_identical_sets_pass():
    d = _dets()
    ok, rep = pvr.compare_detections(d, d)
    assert ok and rep["matched"] == rep["ref_detections"]
    assert rep["max_iou_dev"] == 0.0 and rep["max_score_dev"] == 0.0


def test_comparator_fp_noise_within_tolerance():
    d = _dets()
    noisy = {"boxes": d["boxes"] + 1e-5, "scores": d["scores"] + 1e-4,
             "classes": d["classes"]}
    ok, _ = pvr.compare_detections(d, noisy)
    assert ok


def test_comparator_rejects_shift_rescore_class_drop():
    d = _dets()
    assert not pvr.compare_detections(
        d, {**d, "boxes": d["boxes"] + 0.05})[0]
    assert not pvr.compare_detections(
        d, {**d, "scores": d["scores"] - 0.05})[0]
    assert not pvr.compare_detections(
        d, {**d, "classes": d["classes"] + 1})[0]
    dropped = {k: v[:-1] for k, v in d.items()}
    ok, rep = pvr.compare_detections(d, dropped)
    assert not ok and (rep["missing"] or rep["spurious"])


def test_comparator_ignores_below_threshold():
    d = _dets()
    extra = {"boxes": np.vstack([d["boxes"], [[0.1, 0.1, 0.2, 0.2]]]),
             "scores": np.append(d["scores"], 0.05),
             "classes": np.append(d["classes"], 3)}
    ok, _ = pvr.compare_detections(d, extra, score_threshold=0.3)
    assert ok


def test_compare_priors_stage0():
    """Stage-0 anchor comparison: our own anchors match bit-for-bit; a
    perturbed copy, a wrong-count copy, and a wrong-scale schedule are
    rejected with diagnostics (VERDICT r2 next #7a)."""
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.ops.boxes import generate_anchors

    cfg = get_hyper_params("mobilenet_v2")
    ours = np.asarray(generate_anchors(cfg))
    assert pvr.compare_priors(ours, cfg)
    assert not pvr.compare_priors(ours + 1e-3, cfg)
    assert not pvr.compare_priors(ours[:-1], cfg)
    # A different scale schedule must be caught (the [M] VGG-scales claim).
    wrong = np.asarray(generate_anchors(
        get_hyper_params("mobilenet_v2", scale_min=0.1)))
    assert not pvr.compare_priors(wrong, cfg)


def test_empty_mount_exits_2(tmp_path):
    rc = pvr.main(["--reference", str(tmp_path)])
    assert rc == 2


def test_missing_mount_exits_2(tmp_path):
    rc = pvr.main(["--reference", str(tmp_path / "nope")])
    assert rc == 2


@pytest.mark.slow
def test_mock_mode_passes():
    pytest.importorskip("tensorflow")
    assert pvr.run_mock() is True
