"""Matching invariants (SURVEY.md §4 item 2): padded gts never matched,
positives exceed the IoU threshold, encoded targets decode back to the gt."""

import jax.numpy as jnp
import numpy as np

from tfssd_tpu.config import get_hyper_params
from tfssd_tpu.ops import boxes as box_ops
from tfssd_tpu.ops import matching


def _cfg():
    return get_hyper_params("mobilenet_v2", max_gt_boxes=8)


def test_padded_gt_never_matched():
    cfg = _cfg()
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    gt_boxes = jnp.zeros((8, 4), jnp.float32)
    gt_labels = jnp.zeros((8,), jnp.int32)
    deltas, labels = matching.match_single(anchors, gt_boxes, gt_labels, cfg)
    # No positives: every anchor labelled background.
    np.testing.assert_allclose(np.asarray(labels[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(deltas), 0.0)


def test_anchor_aligned_gt_is_matched():
    cfg = _cfg()
    anchors_np = box_ops.generate_anchors(cfg)
    anchors = jnp.asarray(anchors_np)
    # Place a gt exactly on anchor #100 -> IoU 1 -> positive.
    gt = np.zeros((8, 4), np.float32)
    gt[0] = anchors_np[100]
    labels_in = np.zeros((8,), np.int32)
    labels_in[0] = 7
    deltas, labels = matching.match_single(
        anchors, jnp.asarray(gt), jnp.asarray(labels_in), cfg)
    lab = np.asarray(labels)
    assert lab[100, 7] == 1.0
    np.testing.assert_allclose(np.asarray(deltas)[100], 0.0, atol=1e-5)


def test_positives_have_iou_above_threshold():
    cfg = _cfg()
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    rng = np.random.RandomState(3)
    gt = np.zeros((8, 4), np.float32)
    labels_in = np.zeros((8,), np.int32)
    for g in range(4):
        cy, cx = rng.uniform(0.3, 0.7, 2)
        h, w = rng.uniform(0.2, 0.4, 2)
        gt[g] = [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2]
        labels_in[g] = g + 1
    deltas, labels = matching.match_single(
        anchors, jnp.asarray(gt), jnp.asarray(labels_in), cfg)
    pos = np.asarray(jnp.sum(labels[:, 1:], axis=-1) > 0.5)
    iou = np.asarray(box_ops.iou_matrix(anchors, jnp.asarray(gt)))
    best = iou[:, :4].max(axis=-1)
    assert np.all(best[pos] > cfg.iou_threshold)
    # And every anchor above threshold is positive (threshold-only matching).
    assert np.all(pos[best > cfg.iou_threshold])


def test_encoded_targets_decode_to_gt():
    cfg = _cfg()
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    gt = np.zeros((8, 4), np.float32)
    gt[0] = [0.30, 0.30, 0.62, 0.64]
    labels_in = np.zeros((8,), np.int32)
    labels_in[0] = 3
    deltas, labels = matching.match_single(
        anchors, jnp.asarray(gt), jnp.asarray(labels_in), cfg)
    pos = np.asarray(jnp.sum(labels[:, 1:], axis=-1) > 0.5)
    assert pos.sum() > 0
    decoded = np.asarray(box_ops.decode(anchors, deltas, cfg.variances))
    np.testing.assert_allclose(decoded[pos], gt[0][None].repeat(pos.sum(), 0),
                               atol=1e-4)


def test_force_match_assigns_every_gt():
    """With force_match_for_gt, a tiny gt that no anchor overlaps > 0.5
    still gets its best anchor."""
    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8,
                           force_match_for_gt=True)
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    gt = np.zeros((8, 4), np.float32)
    gt[0] = [0.40, 0.40, 0.43, 0.43]  # tiny box; under-threshold everywhere
    labels_in = np.zeros((8,), np.int32)
    labels_in[0] = 5
    _, labels = matching.match_single(
        anchors, jnp.asarray(gt), jnp.asarray(labels_in), cfg)
    assert np.asarray(labels[:, 5]).sum() >= 1.0
    # Threshold-only config leaves it unmatched.
    cfg0 = get_hyper_params("mobilenet_v2", max_gt_boxes=8)
    _, labels0 = matching.match_single(
        anchors, jnp.asarray(gt), jnp.asarray(labels_in), cfg0)
    assert np.asarray(labels0[:, 5]).sum() == 0.0


def test_match_batch_shapes():
    cfg = _cfg()
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    gt_boxes = jnp.zeros((4, 8, 4), jnp.float32)
    gt_labels = jnp.zeros((4, 8), jnp.int32)
    deltas, labels = matching.match_batch(anchors, gt_boxes, gt_labels, cfg)
    assert deltas.shape == (4, cfg.total_anchors, 4)
    assert labels.shape == (4, cfg.total_anchors, cfg.total_labels)


def test_force_match_deterministic_with_padded_gts():
    # Padded gt rows all argmax to anchor 0 on an all-zero IoU column; the
    # forced-positive scatter must not let them clobber a real gt that
    # also claims anchor 0 (regression: duplicate-index .at[].set race).
    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8,
                           force_match_for_gt=True)
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    # One tiny gt whose best anchor is anchor 0 (the first 19x19 cell
    # anchor sits at the top-left corner).
    gt = jnp.zeros((1, 8, 4)).at[0, 0].set(anchors[0] * 0.6 + 0.02)
    labels = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(3)
    deltas, onehot = matching.match_batch(anchors, gt, labels, cfg)
    best_anchor = int(jnp.argmax(
        box_ops.iou_matrix(anchors, gt[0])[:, 0]))
    # the real gt's best anchor must be positive with its class
    assert float(onehot[0, best_anchor, 3]) == 1.0
    # padded gts must not create positives anywhere
    assert float(jnp.sum(onehot[0, :, 1:])) >= 1.0
    pos_anchors = jnp.sum(onehot[0, :, 1:], axis=-1) > 0.5
    # every positive anchor's matched class is 3 (the only real gt)
    assert float(jnp.sum(onehot[0, :, 3])) == float(jnp.sum(pos_anchors))


def test_force_match_ignores_degenerate_labeled_gt():
    # A zero-area gt row that still carries a label (corrupt annotation,
    # or a box zeroed without zeroing its label) has an all-zero IoU
    # column: argmax lands on anchor 0, and an unguarded force step
    # would mark anchor 0 a spurious positive of that class. Both
    # matcher paths must refuse to force it (module invariant: a
    # degenerate box can never be matched).
    from tfssd_tpu.ops.kernels.match_encode import match_batch_pallas

    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8,
                           force_match_for_gt=True)
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    gt = jnp.zeros((1, 8, 4))          # all rows zero-area
    labels = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(5)  # labeled junk
    for name, fn in (("jnp", matching.match_batch),
                     ("pallas", lambda a, b, l, c: match_batch_pallas(
                         a, b, l, c, interpret=True))):
        deltas, onehot = fn(anchors, gt, labels, cfg)
        assert float(jnp.sum(onehot[0, :, 1:])) == 0.0, name
        assert float(jnp.sum(jnp.abs(deltas))) == 0.0, name


def test_match_batch_matches_numpy_oracle():
    # Property fuzz: the in-jit matcher vs a from-scratch numpy oracle
    # implementing the reference semantics (calculate_actual_outputs)
    # with plain loops — threshold matching, first-best tie-break,
    # variance-scaled center-form encoding, background one-hots.
    import numpy as onp

    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8)
    anchors = onp.asarray(box_ops.generate_anchors(cfg))
    rng = onp.random.default_rng(4)
    B, G, N, L = 3, 8, anchors.shape[0], cfg.total_labels
    boxes = onp.zeros((B, G, 4), onp.float32)
    labels = onp.zeros((B, G), onp.int32)
    for i in range(B):
        for j in range(int(rng.integers(0, G))):
            y0, x0 = rng.uniform(0, 0.7, 2)
            h, w = rng.uniform(0.05, 0.3, 2)
            boxes[i, j] = [y0, x0, min(y0 + h, 1), min(x0 + w, 1)]
            labels[i, j] = rng.integers(1, L)

    def iou(a, b):
        iy0, ix0 = max(a[0], b[0]), max(a[1], b[1])
        iy1, ix1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(iy1 - iy0, 0.0) * max(ix1 - ix0, 0.0)
        area = lambda r: max(r[2] - r[0], 0.0) * max(r[3] - r[1], 0.0)
        u = area(a) + area(b) - inter
        return inter / u if u > 0 else 0.0

    want_deltas = onp.zeros((B, N, 4), onp.float32)
    want_labels = onp.zeros((B, N), onp.int32)
    for i in range(B):
        for a_idx in range(N):
            best_iou, best_g = 0.0, 0
            for g in range(G):
                if labels[i, g] <= 0:
                    continue
                o = iou(anchors[a_idx], boxes[i, g])
                if o > best_iou:  # strict >: first best wins ties
                    best_iou, best_g = o, g
            if best_iou > cfg.iou_threshold:
                want_labels[i, a_idx] = labels[i, best_g]
                ay0, ax0, ay1, ax1 = anchors[a_idx]
                gy0, gx0, gy1, gx1 = boxes[i, best_g]
                acy, acx = (ay0 + ay1) / 2, (ax0 + ax1) / 2
                ah, aw = ay1 - ay0, ax1 - ax0
                gcy, gcx = (gy0 + gy1) / 2, (gx0 + gx1) / 2
                gh, gw = gy1 - gy0, gx1 - gx0
                v = cfg.variances
                want_deltas[i, a_idx] = [
                    (gcy - acy) / ah / v[0], (gcx - acx) / aw / v[1],
                    onp.log(gh / ah) / v[2], onp.log(gw / aw) / v[3]]

    got_deltas, got_onehot = matching.match_batch(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(labels), cfg)
    got_labels = onp.argmax(onp.asarray(got_onehot), axis=-1)
    onp.testing.assert_array_equal(got_labels, want_labels)
    onp.testing.assert_allclose(onp.asarray(got_deltas), want_deltas,
                                atol=2e-5)
