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
