"""NMS tests (SURVEY.md §4 item 5): hand-built score maps give the
expected surviving boxes; combined semantics (no cross-class suppression)."""

import jax
import jax.numpy as jnp
import numpy as np

from tfssd_tpu.ops import nms


def _res(boxes, scores, **kw):
    return nms.combined_nms(jnp.asarray(boxes, jnp.float32)[None],
                            jnp.asarray(scores, jnp.float32)[None], **kw)


def test_overlapping_boxes_suppressed():
    boxes = [[0.1, 0.1, 0.5, 0.5],
             [0.12, 0.12, 0.52, 0.52],   # IoU ~0.8 with #0 -> suppressed
             [0.6, 0.6, 0.9, 0.9]]
    scores = [[0.9], [0.8], [0.7]]
    r = _res(boxes, scores, max_total_detections=10)
    assert int(r.valid[0]) == 2
    got = np.asarray(r.boxes[0, :2])
    np.testing.assert_allclose(got, [boxes[0], boxes[2]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.scores[0, :2]), [0.9, 0.7])


def test_no_cross_class_suppression():
    boxes = [[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]]
    scores = [[0.9, 0.0], [0.0, 0.8]]  # same box, two classes
    r = _res(boxes, scores, max_total_detections=10)
    assert int(r.valid[0]) == 2
    cls = sorted(np.asarray(r.classes[0, :2]).tolist())
    assert cls == [0, 1]


def test_score_threshold_filters():
    boxes = [[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]]
    scores = [[0.9], [0.05]]
    r = _res(boxes, scores, score_threshold=0.1, max_total_detections=10)
    assert int(r.valid[0]) == 1


def test_max_total_truncates_by_score():
    rng = np.random.RandomState(0)
    n = 50
    # Non-overlapping small boxes on a grid.
    boxes = []
    for i in range(n):
        y, x = divmod(i, 10)
        boxes.append([y * 0.1, x * 0.1, y * 0.1 + 0.05, x * 0.1 + 0.05])
    scores = rng.uniform(0.1, 1.0, size=(n, 1))
    r = _res(boxes, scores, max_total_detections=5)
    assert int(r.valid[0]) == 5
    want = np.sort(scores[:, 0])[::-1][:5]
    np.testing.assert_allclose(np.asarray(r.scores[0]), want, atol=1e-6)
    # Scores are sorted descending.
    s = np.asarray(r.scores[0])
    assert np.all(np.diff(s) <= 1e-9)


def test_negative_scores_with_permissive_threshold():
    # tf.image.combined_non_max_suppression semantics allow any
    # score_threshold (e.g. -inf with margin/logit scores): kept
    # negative-score detections must survive the global merge and be
    # marked valid. Regression for the old `score > 0` validity test,
    # which let zeroed suppressed rows outrank kept negative scores.
    boxes = [[0.1, 0.1, 0.5, 0.5],
             [0.12, 0.12, 0.52, 0.52],   # IoU ~0.8 with #0 -> suppressed
             [0.6, 0.6, 0.9, 0.9]]
    scores = [[-0.3], [-0.5], [-1.2]]
    r = _res(boxes, scores, score_threshold=-1e9, max_total_detections=8)
    assert int(r.valid[0]) == 2
    np.testing.assert_allclose(np.asarray(r.scores[0, :2]), [-0.3, -1.2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.boxes[0, :2]),
                               [boxes[0], boxes[2]], atol=1e-6)
    # padding rows stay 0-score / -1-class
    assert np.all(np.asarray(r.classes[0, 2:]) == -1)
    assert np.all(np.asarray(r.scores[0, 2:]) == 0.0)


def test_merge_kept_minus_inf_outranks_suppressed_sentinels():
    # A kept row whose raw score is exactly -inf ties with the -inf
    # suppression sentinels in a naive top_k key (top_k breaks ties by
    # position, so the kept row could sort behind a suppressed row and
    # be dropped). The merge's sort key clamps kept scores to
    # >= -finfo.max, so the kept row must survive, rank last among kept
    # rows, and report its exact raw score. combined_nms itself can't
    # reach this state (valid = score > threshold excludes -inf), so
    # drive _merge_detections directly.
    top_scores = jnp.asarray(
        [[[0.9, -jnp.inf, 0.5, 0.2]]], jnp.float32)       # (1, 1, 4)
    # row 1 (-inf) KEPT; rows 2 and 3 suppressed -> sentinel ties sit
    # at positions AFTER the kept -inf row, the bad ordering case.
    keep = jnp.asarray([[[True, True, False, False]]])
    boxes = jnp.tile(jnp.asarray([0.1, 0.1, 0.2, 0.2], jnp.float32),
                     (1, 4, 1))
    r = nms._merge_detections(
        top_scores, keep, boxes, num_classes=1, k=4,
        max_total_detections=4)
    assert int(r.valid[0]) == 2
    assert np.asarray(r.scores[0, 0]) == np.float32(0.9)
    assert np.isneginf(np.asarray(r.scores[0, 1]))
    assert np.all(np.asarray(r.classes[0, :2]) == 0)
    assert np.all(np.asarray(r.classes[0, 2:]) == -1)


def test_prefilter_with_inf_scores_matches_exact():
    # Regression (r5 review): the prefilter's one-hot payload matmul
    # NaN-poisoned every picked row when scores contained -inf
    # (0 x inf = NaN), silently dropping all real detections. The
    # payload now carries finite parts + exact 0/1 inf-mask columns.
    rng = np.random.RandomState(11)
    n, c = 60, 3
    boxes = np.stack([
        rng.uniform(0, 0.45, (n,)), rng.uniform(0, 0.45, (n,)),
        rng.uniform(0.5, 1.0, (n,)), rng.uniform(0.5, 1.0, (n,)),
    ], axis=-1).astype(np.float32)
    scores = rng.uniform(-2, 2, (n, c)).astype(np.float32)
    scores[5:, :] = -np.inf       # mask most anchors, margin-score style
    scores[3, 1] = np.inf         # and a +inf corner
    b = jnp.asarray(boxes)[None]
    s = jnp.asarray(scores)[None]
    kw = dict(score_threshold=-np.inf, max_total_detections=16,
              max_detections_per_class=16)
    exact = nms.combined_nms(b, s, prefilter_anchors=0, **kw)
    pre = nms.combined_nms(b, s, prefilter_anchors=32, **kw)
    assert np.all(np.isfinite(np.asarray(pre.boxes)))
    assert int(pre.valid[0]) == int(exact.valid[0]) > 0
    np.testing.assert_array_equal(np.asarray(exact.classes),
                                  np.asarray(pre.classes))
    np.testing.assert_allclose(np.asarray(exact.scores),
                               np.asarray(pre.scores), atol=0)
    np.testing.assert_allclose(np.asarray(exact.boxes),
                               np.asarray(pre.boxes), atol=0)


def test_gather_rows_onehot_exact():
    # The MXU one-hot gather (f32 HIGHEST einsum) must be bit-exact vs
    # take_along_axis — it selects single f32 values, so any deviation
    # means the precision mode regressed. Checked on both sides of the
    # width gate and with force_onehot on a wide table.
    rng = np.random.RandomState(3)
    for n, force in ((64, False), (300, False), (2048, True)):
        table = jnp.asarray(rng.randn(4, n, 6).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, (4, 37)).astype(np.int32))
        ref = jnp.take_along_axis(table, idx[..., None], axis=1)
        out = nms._gather_rows(table, idx, force_onehot=force)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # above the gate without force: falls back to the same gather
    table = jnp.asarray(rng.randn(2, 2048, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 2048, (2, 10)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(table, idx[..., None], axis=1)),
        np.asarray(nms._gather_rows(table, idx)))


def test_padding_rows_are_marked():
    boxes = [[0.1, 0.1, 0.5, 0.5]]
    scores = [[0.9]]
    r = _res(boxes, scores, max_total_detections=8)
    assert int(r.valid[0]) == 1
    assert np.all(np.asarray(r.classes[0, 1:]) == -1)
    assert np.all(np.asarray(r.scores[0, 1:]) == 0.0)
    assert np.all(np.asarray(r.boxes[0, 1:]) == 0.0)


def test_nms_jit_and_batch():
    rng = np.random.RandomState(1)
    boxes = rng.uniform(0, 1, size=(4, 100, 2, 2)).astype(np.float32)
    boxes = np.concatenate([boxes.min(axis=2), boxes.max(axis=2)], axis=-1)
    scores = rng.uniform(0, 1, size=(4, 100, 20)).astype(np.float32)
    fn = jax.jit(lambda b, s: nms.combined_nms(b, s, 50, 30, 0.45, 0.3))
    r = fn(jnp.asarray(boxes), jnp.asarray(scores))
    assert r.boxes.shape == (4, 30, 4)
    assert r.scores.shape == (4, 30)
    assert r.classes.shape == (4, 30)
    assert r.valid.shape == (4,)
    # Every surviving pair within a class has IoU <= threshold.
    from tfssd_tpu.ops import boxes as box_ops
    for b in range(4):
        v = int(r.valid[b])
        bb = np.asarray(r.boxes[b, :v])
        cc = np.asarray(r.classes[b, :v])
        iou = np.asarray(box_ops.iou_matrix(jnp.asarray(bb), jnp.asarray(bb)))
        same = cc[:, None] == cc[None, :]
        off = ~np.eye(v, dtype=bool)
        assert np.all(iou[same & off] <= 0.45 + 1e-6)


def _numpy_combined_nms(boxes, scores, max_per_class, max_total,
                        iou_thr, score_thr):
    """Independent full-pipeline oracle: per class, score-sorted greedy
    suppression over the top-max_per_class candidates; then a global
    score-sorted merge truncated to max_total. Mirrors the semantics
    combined_nms implements (tf.image.combined_non_max_suppression)."""
    n, c = scores.shape
    dets = []
    for cls in range(c):
        order = np.argsort(-scores[:, cls], kind="stable")[:max_per_class]
        kept = []
        for i in order:
            if scores[i, cls] <= score_thr:
                continue
            ok = True
            for j in kept:
                y0 = max(boxes[i, 0], boxes[j, 0])
                x0 = max(boxes[i, 1], boxes[j, 1])
                y1 = min(boxes[i, 2], boxes[j, 2])
                x1 = min(boxes[i, 3], boxes[j, 3])
                inter = max(y1 - y0, 0) * max(x1 - x0, 0)
                a_i = max(boxes[i, 2] - boxes[i, 0], 0) * max(
                    boxes[i, 3] - boxes[i, 1], 0)
                a_j = max(boxes[j, 2] - boxes[j, 0], 0) * max(
                    boxes[j, 3] - boxes[j, 1], 0)
                if inter / max(a_i + a_j - inter, 1e-8) > iou_thr:
                    ok = False
                    break
            if ok:
                kept.append(i)
        dets.extend((float(scores[i, cls]), cls, i) for i in kept)
    dets.sort(key=lambda d: -d[0])
    return dets[:max_total]


def test_combined_nms_full_pipeline_vs_numpy_oracle():
    # End-to-end fuzz of candidate selection + suppression + merge
    # against an independently-written sequential oracle (the
    # stage-level oracles missed two r5 merge/prefilter-layer bugs).
    # Continuous random scores make ties measure-zero, so the kept
    # (class, score, box) multisets must match exactly.
    rng = np.random.RandomState(17)
    for trial in range(10):
        n, c = rng.randint(20, 90), rng.randint(2, 6)
        boxes = np.stack([
            rng.uniform(0, 0.6, (n,)), rng.uniform(0, 0.6, (n,)),
            np.zeros(n), np.zeros(n)], axis=-1).astype(np.float32)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(0.05, 0.4, (n,))
        boxes[:, 3] = boxes[:, 1] + rng.uniform(0.05, 0.4, (n,))
        boxes = np.clip(boxes, 0, 1).astype(np.float32)
        scores = rng.uniform(-0.5, 1, (n, c)).astype(np.float32)
        r = nms.combined_nms(jnp.asarray(boxes)[None],
                             jnp.asarray(scores)[None],
                             prefilter_anchors=0,
                             max_detections_per_class=16,
                             max_total_detections=24,
                             iou_threshold=0.5, score_threshold=0.05)
        oracle = _numpy_combined_nms(boxes, scores, 16, 24, 0.5, 0.05)
        v = int(r.valid[0])
        assert v == len(oracle), (trial, v, len(oracle))
        got = sorted(
            (round(float(r.scores[0, i]), 5), int(r.classes[0, i]),
             tuple(np.round(np.asarray(r.boxes[0, i]), 5)))
            for i in range(v))
        want = sorted(
            (round(s, 5), cls, tuple(np.round(boxes[i], 5)))
            for s, cls, i in oracle)
        assert got == want, (trial, got[:3], want[:3])


def test_fixpoint_matches_sequential_greedy():
    # The MXU fixpoint formulation must equal the textbook sequential
    # greedy on random candidate sets, including adversarial chains.
    rng = np.random.RandomState(7)
    from tfssd_tpu.ops import boxes as box_ops

    for trial in range(8):
        k = 64
        centers = rng.uniform(0.2, 0.8, size=(k, 2))
        sizes = rng.uniform(0.05, 0.4, size=(k, 2))
        b = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
        b = np.clip(b, 0, 1).astype(np.float32)
        ious = box_ops.iou_matrix(jnp.asarray(b), jnp.asarray(b))
        valid = jnp.asarray(rng.rand(k) > 0.1)
        fast = nms._greedy_keep(ious, valid, 0.45)
        slow = nms._greedy_keep_sequential(ious, valid, 0.45)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))

    # adversarial chain: each box overlaps only its neighbor
    k = 32
    b = np.zeros((k, 4), np.float32)
    for i in range(k):
        b[i] = [0.0, i * 0.05, 0.1, i * 0.05 + 0.09]  # ~45% overlap chain
    ious = box_ops.iou_matrix(jnp.asarray(b), jnp.asarray(b))
    valid = jnp.ones(k, bool)
    fast = nms._greedy_keep(ious, valid, 0.3)
    slow = nms._greedy_keep_sequential(ious, valid, 0.3)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_blocked_matches_sequential_greedy():
    # The blocked triangular solve (default impl) must equal the textbook
    # sequential greedy, including across block boundaries (K > 64) and
    # on heavily overlapping candidate sets (where the fixpoint's sweep
    # count explodes — the case the blocked form was built for).
    rng = np.random.RandomState(11)
    from tfssd_tpu.ops import boxes as box_ops

    for k, spread in [(200, 1.0), (200, 0.1), (130, 0.3), (65, 0.05),
                      (64, 1.0), (7, 1.0)]:
        m = 5
        centers = rng.uniform(0.3, 0.7, size=(m, k, 2)) * spread + 0.15
        sizes = rng.uniform(0.05, 0.4, size=(m, k, 2)) * max(spread, 0.3)
        b = np.clip(np.concatenate(
            [centers - sizes / 2, centers + sizes / 2], -1), 0, 1)
        b = jnp.asarray(b, jnp.float32)
        valid = jnp.asarray(rng.rand(m, k) > 0.1)
        blocked = np.asarray(nms._greedy_keep_blocked(b, valid, 0.45))
        for i in range(m):
            ious = box_ops.iou_matrix(b[i], b[i])
            slow = nms._greedy_keep_sequential(ious, valid[i], 0.45)
            np.testing.assert_array_equal(blocked[i], np.asarray(slow),
                                          err_msg=f"k={k} spread={spread}")


def test_prefilter_no_op_when_m_exceeds_n():
    rng = np.random.RandomState(3)
    raw = rng.uniform(0, 1, size=(2, 90, 2, 2)).astype(np.float32)
    boxes = np.concatenate([raw.min(axis=2), raw.max(axis=2)], axis=-1)
    scores = rng.uniform(0, 1, size=(2, 90, 6)).astype(np.float32)
    exact = nms.combined_nms(jnp.asarray(boxes), jnp.asarray(scores))
    pref = nms.combined_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            prefilter_anchors=512)
    for f in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(exact, f)),
                                      np.asarray(getattr(pref, f)), f)


def test_prefilter_matches_exact_on_peaked_scores():
    # Trained-model-like input: a few strong detections, junk tail. The
    # top-M cut must not change any detection with a meaningful score.
    rng = np.random.RandomState(5)
    n, c, m = 600, 8, 128
    raw = rng.uniform(0, 1, size=(2, n, 2, 2)).astype(np.float32)
    boxes = np.concatenate([raw.min(axis=2), raw.max(axis=2)], axis=-1)
    scores = rng.uniform(0, 0.01, size=(2, n, c)).astype(np.float32)
    for img in range(2):
        strong = rng.choice(n, 40, replace=False)
        scores[img, strong, rng.randint(0, c, 40)] = rng.uniform(
            0.3, 1.0, 40)
    exact = nms.combined_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             max_total_detections=50, score_threshold=0.05)
    pref = nms.combined_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            max_total_detections=50, score_threshold=0.05,
                            prefilter_anchors=m)
    for f in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(exact, f)),
                                      np.asarray(getattr(pref, f)), f)


def test_planes_impl_matches_reference_layout():
    # combined_nms_planes must reproduce combined_nms (both f32 IoU at
    # small K so bf16 borderline effects don't apply: compare vs the
    # sequential oracle per class instead of the bf16 fast path).
    from tfssd_tpu.ops import boxes as box_ops

    rng = np.random.RandomState(9)
    b, n, c = 3, 80, 5
    raw = rng.uniform(0, 1, size=(b, n, 2, 2)).astype(np.float32)
    boxes = np.concatenate([raw.min(axis=2), raw.max(axis=2)], axis=-1)
    scores = rng.uniform(0, 1, size=(b, n, c)).astype(np.float32)

    planes = tuple(jnp.asarray(boxes[..., i]) for i in range(4))
    scores_t = jnp.asarray(np.moveaxis(scores, 2, 1))
    rp = nms.combined_nms_planes(planes, scores_t, 40, 20, 0.45, 0.2)

    # oracle: per-class sequential greedy + global merge
    k = 40
    ts, ti = jax.lax.top_k(jnp.asarray(np.moveaxis(scores, 2, 1)), k)
    for img in range(b):
        got_rows = int(rp.valid[img])
        kept_all = []
        for cls in range(c):
            idx = np.asarray(ti[img, cls])
            cand = jnp.asarray(boxes[img][idx])
            ious = box_ops.iou_matrix(cand, cand)
            valid = jnp.asarray(np.asarray(ts[img, cls]) > 0.2)
            keep = np.asarray(
                nms._greedy_keep_sequential(ious, valid, 0.45))
            for j in np.where(keep)[0]:
                kept_all.append((float(ts[img, cls, j]), cls,
                                 boxes[img][idx[j]]))
        kept_all.sort(key=lambda r: -r[0])
        kept_all = kept_all[:20]
        assert got_rows == len(kept_all)
        for row, (score, cls, box) in enumerate(kept_all):
            assert abs(float(rp.scores[img, row]) - score) < 1e-6
            assert int(rp.classes[img, row]) == cls
            np.testing.assert_allclose(np.asarray(rp.boxes[img, row]), box,
                                       atol=1e-6)


def test_decode_to_planes_matches_decode():
    from tfssd_tpu.ops import boxes as box_ops
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.ops.boxes import generate_anchors

    cfg = get_hyper_params("mobilenet_v2")
    anchors = jnp.asarray(generate_anchors(cfg))
    rng = np.random.RandomState(2)
    deltas = jnp.asarray(rng.normal(0, 0.6, (2, cfg.total_anchors, 4)),
                         jnp.float32)
    ref = np.asarray(box_ops.clip_boxes(
        box_ops.decode(anchors, deltas, cfg.variances)))
    planes = box_ops.decode_to_planes(
        anchors, jnp.moveaxis(deltas, 2, 1), cfg.variances)
    got = np.stack([np.asarray(p) for p in planes], axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
