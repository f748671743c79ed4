"""Pallas kernel parity tests vs their jnp references (SURVEY.md §4
item 4). Run in interpreter mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu import get_hyper_params
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.ops.kernels.match_encode import match_batch_pallas
from tfssd_tpu.ops.matching import match_batch


def _random_gt(rng, b, g, num_classes=20):
    n_valid = rng.integers(0, g + 1, size=b)
    boxes = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    for i in range(b):
        for j in range(int(n_valid[i])):
            y0, x0 = rng.uniform(0, 0.7, 2)
            h, w = rng.uniform(0.1, 0.3, 2)
            boxes[i, j] = [y0, x0, min(y0 + h, 1), min(x0 + w, 1)]
            labels[i, j] = rng.integers(1, num_classes + 1)
    return jnp.asarray(boxes), jnp.asarray(labels)


@pytest.mark.parametrize("backbone", ["mobilenet_v2"])
def test_match_encode_parity(backbone):
    cfg = get_hyper_params(backbone, max_gt_boxes=16)
    anchors = jnp.asarray(generate_anchors(cfg))
    rng = np.random.default_rng(0)
    gt_boxes, gt_labels = _random_gt(rng, 4, 16)

    ref_deltas, ref_labels = match_batch(anchors, gt_boxes, gt_labels, cfg)
    pal_deltas, pal_labels = match_batch_pallas(
        anchors, gt_boxes, gt_labels, cfg, interpret=True)

    np.testing.assert_allclose(np.asarray(pal_deltas),
                               np.asarray(ref_deltas), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pal_labels),
                                  np.asarray(ref_labels))


def test_match_encode_anchor_aligned_gt():
    # gt exactly on an anchor: that anchor must be positive with zero deltas
    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8)
    anchors = jnp.asarray(generate_anchors(cfg))
    gt_boxes = jnp.zeros((1, 8, 4)).at[0, 0].set(anchors[123])
    gt_labels = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(7)
    deltas, onehot = match_batch_pallas(anchors, gt_boxes, gt_labels, cfg,
                                        interpret=True)
    assert float(onehot[0, 123, 7]) == 1.0
    np.testing.assert_allclose(np.asarray(deltas[0, 123]), np.zeros(4),
                               atol=1e-5)


def test_match_encode_zero_gt():
    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=8)
    anchors = jnp.asarray(generate_anchors(cfg))
    deltas, onehot = match_batch_pallas(
        anchors, jnp.zeros((2, 8, 4)), jnp.zeros((2, 8), jnp.int32), cfg,
        interpret=True)
    assert float(jnp.sum(jnp.abs(deltas))) == 0.0
    # all background
    np.testing.assert_allclose(np.asarray(onehot[..., 0]), 1.0)


def test_match_encode_nondivisible_anchor_count():
    # vgg16's 8732 anchors are not a multiple of the 512 tile
    cfg = get_hyper_params("vgg16", max_gt_boxes=8)
    anchors = jnp.asarray(generate_anchors(cfg))
    rng = np.random.default_rng(3)
    gt_boxes, gt_labels = _random_gt(rng, 2, 8)
    ref = match_batch(anchors, gt_boxes, gt_labels, cfg)
    pal = match_batch_pallas(anchors, gt_boxes, gt_labels, cfg,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(pal[0]), np.asarray(ref[0]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pal[1]), np.asarray(ref[1]))


@pytest.mark.parametrize("seed", [0, 7, 11, 23, 42])
def test_match_encode_force_match_parity(seed):
    # config.force_match_for_gt with the Pallas matcher (VERDICT r3
    # missing #4): the kernel+post-pass must reproduce the jnp matcher's
    # bipartite force-match exactly. Multi-seed fuzz on purpose: the
    # per-gt argmax must come from the SAME iou_matrix expression the
    # jnp matcher evaluates — an early variant recovered it from the
    # kernel's own IoU arithmetic, whose different rounding flipped
    # winners on the exact-IoU ties symmetric anchor grids produce, and
    # a single-seed test passed by luck.
    cfg = get_hyper_params("mobilenet_v2", max_gt_boxes=16,
                           force_match_for_gt=True)
    anchors = jnp.asarray(generate_anchors(cfg))
    rng = np.random.default_rng(seed)
    gt_boxes, gt_labels = _random_gt(rng, 8, 16)
    # a sub-threshold sliver gt in image 0: forced positive only via the
    # bipartite step
    gt_boxes = gt_boxes.at[0, 0].set(
        jnp.asarray([0.41, 0.41, 0.435, 0.435]))
    gt_labels = gt_labels.at[0, 0].set(3)

    ref_deltas, ref_labels = match_batch(anchors, gt_boxes, gt_labels, cfg)
    pal_deltas, pal_labels = match_batch_pallas(
        anchors, gt_boxes, gt_labels, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal_labels),
                                  np.asarray(ref_labels))
    np.testing.assert_allclose(np.asarray(pal_deltas),
                               np.asarray(ref_deltas), atol=1e-5)
    # the sliver's best anchor really was forced positive (label 3 set)
    assert np.asarray(pal_labels)[0, :, 3].sum() >= 1


def test_train_step_with_pallas_matcher():
    # use_pallas routes the train step through the fused kernel
    # (interpret-mode on CPU via the pallas interpret fallback is not
    # plumbed through config, so run the kernel path directly in
    # interpret mode and the config-dispatch with a tiny jit step).
    from tfssd_tpu.models import get_model
    from tfssd_tpu.train import create_train_state, make_optimizer, _matcher

    cfg = get_hyper_params("mobilenet_v2", use_pallas=True)
    assert _matcher(cfg).__name__ == "match_batch_pallas"
    cfg2 = get_hyper_params("mobilenet_v2")
    assert _matcher(cfg2).__name__ == "match_batch"


@pytest.mark.slow
def test_pallas_train_step_runs_on_cpu():
    # Full jitted train step with use_pallas=True on the CPU mesh: the
    # interpret fallback must kick in automatically.
    import jax.numpy as jnp
    from tfssd_tpu.data import SyntheticDataset, batch_examples
    from tfssd_tpu.models import get_model
    from tfssd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    cfg = get_hyper_params(
        "mobilenet_v2", img_size=96, feature_map_shapes=(6, 3, 2, 1, 1, 1),
        total_labels=6, max_gt_boxes=8, use_pallas=True)
    from tfssd_tpu.ops.boxes import generate_anchors as gen
    model = get_model(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(make_train_step(model, gen(cfg), opt, augment=False))
    ds = SyntheticDataset(4, image_size=96, num_classes=5)
    batch = next(batch_examples(ds, 4, cfg.max_gt_boxes))
    batch = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    s, m = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_nms_keep_pallas_parity():
    # Fused kernel keep decisions == exact greedy (jnp reference), K
    # deliberately small so interpreter-mode while loops stay fast.
    from tfssd_tpu.ops import boxes as box_ops
    from tfssd_tpu.ops.kernels.nms_keep import nms_keep_pallas
    from tfssd_tpu.ops.nms import _greedy_keep_sequential

    rng = np.random.default_rng(11)
    r, k = 6, 32
    centers = rng.uniform(0.2, 0.8, (r, k, 2))
    sizes = rng.uniform(0.05, 0.4, (r, k, 2))
    boxes = np.clip(np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], -1), 0, 1).astype(
            np.float32)
    scores = np.sort(rng.uniform(0, 1, (r, k)).astype(np.float32),
                     axis=-1)[:, ::-1].copy()
    scores[:, -4:] = 0.0  # some below-threshold rows

    keep = nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                           0.45, 0.05, interpret=True)
    for i in range(r):
        ious = box_ops.iou_matrix(jnp.asarray(boxes[i]),
                                  jnp.asarray(boxes[i]))
        ref = _greedy_keep_sequential(
            ious, jnp.asarray(scores[i] > 0.05), 0.45)
        np.testing.assert_array_equal(np.asarray(keep[i]), np.asarray(ref))


def test_combined_nms_pallas_impl_matches_xla():
    from tfssd_tpu.ops import nms as nms_mod

    rng = np.random.RandomState(5)
    raw = rng.uniform(0, 1, size=(2, 64, 2, 2)).astype(np.float32)
    boxes = np.concatenate([raw.min(axis=2), raw.max(axis=2)], axis=-1)
    scores = rng.uniform(0, 1, size=(2, 64, 4)).astype(np.float32)
    a = nms_mod.combined_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             32, 16, 0.45, 0.3, impl="xla")
    b = nms_mod.combined_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             32, 16, 0.45, 0.3, impl="pallas")
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.classes),
                                  np.asarray(b.classes))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
