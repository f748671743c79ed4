"""Geometry golden tests (SURVEY.md §4 item 1): anchor counts/schedule,
IoU vs brute-force numpy, encode/decode round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from tfssd_tpu.config import get_hyper_params
from tfssd_tpu.ops import boxes as box_ops


def test_ssd300_vgg16_anchor_count_is_8732():
    cfg = get_hyper_params("vgg16")
    anchors = box_ops.generate_anchors(cfg)
    # 38^2*4 + 19^2*6 + 10^2*6 + 5^2*6 + 3^2*4 + 1^2*4 = 8732 (SSD paper)
    assert anchors.shape == (8732, 4)
    assert cfg.total_anchors == 8732
    assert cfg.anchors_per_map == (5776, 2166, 600, 150, 36, 4)


def test_mobilenet_v2_anchor_count():
    cfg = get_hyper_params("mobilenet_v2")
    anchors = box_ops.generate_anchors(cfg)
    # 19^2*4 + 10^2*6 + 5^2*6 + 3^2*6 + 2^2*4 + 1^2*4 = 2268
    assert anchors.shape == (2268, 4)


def test_ssd512_anchor_count():
    cfg = get_hyper_params("vgg16_512")
    anchors = box_ops.generate_anchors(cfg)
    n = 64**2 * 4 + 32**2 * 6 + 16**2 * 6 + 8**2 * 6 + 4**2 * 6 + 2**2 * 4 + 4
    assert anchors.shape == (n, 4)


def test_anchors_normalized_and_clipped():
    for backbone in ("vgg16", "mobilenet_v2", "vgg16_512"):
        anchors = box_ops.generate_anchors(get_hyper_params(backbone))
        assert np.all(anchors >= 0.0) and np.all(anchors <= 1.0)
        assert np.all(anchors[:, 2] >= anchors[:, 0])
        assert np.all(anchors[:, 3] >= anchors[:, 1])


def test_scale_schedule_linear():
    cfg = get_hyper_params("mobilenet_v2")
    scales = cfg.map_scales
    np.testing.assert_allclose(
        scales, [0.2, 0.34, 0.48, 0.62, 0.76, 0.9, 1.0], atol=1e-6
    )


def test_last_map_center_anchor_geometry():
    """The 1x1 map's ar=1 anchor must be centered at (0.5, 0.5) with side
    s_m (clipped)."""
    cfg = get_hyper_params("mobilenet_v2")
    anchors = box_ops.generate_anchors(cfg)
    last = anchors[-4:]  # 1x1 map, 4 anchors
    ar1 = last[0]  # first aspect ratio is 1.0
    s = cfg.map_scales[-2]  # 0.9
    expect = np.clip([0.5 - s / 2, 0.5 - s / 2, 0.5 + s / 2, 0.5 + s / 2], 0, 1)
    np.testing.assert_allclose(ar1, expect, atol=1e-6)


def _iou_numpy(a, b):
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ymin = max(bi[0], bj[0])
            xmin = max(bi[1], bj[1])
            ymax = min(bi[2], bj[2])
            xmax = min(bi[3], bj[3])
            inter = max(0.0, ymax - ymin) * max(0.0, xmax - xmin)
            area_i = max(0.0, bi[2] - bi[0]) * max(0.0, bi[3] - bi[1])
            area_j = max(0.0, bj[2] - bj[0]) * max(0.0, bj[3] - bj[1])
            union = area_i + area_j - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 1, size=(16, 2, 2))
    a = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)
    pts = rng.uniform(0, 1, size=(7, 2, 2))
    b = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)
    got = np.asarray(box_ops.iou_matrix(jnp.asarray(a, jnp.float32),
                                        jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(got, _iou_numpy(a, b), atol=1e-5)


def test_iou_zero_area_boxes():
    a = jnp.asarray([[0.1, 0.1, 0.5, 0.5]], jnp.float32)
    padded = jnp.zeros((3, 4), jnp.float32)
    assert np.all(np.asarray(box_ops.iou_matrix(a, padded)) == 0.0)


def test_encode_decode_roundtrip():
    cfg = get_hyper_params("vgg16")
    anchors = jnp.asarray(box_ops.generate_anchors(cfg))
    rng = np.random.RandomState(1)
    pts = rng.uniform(0.05, 0.95, size=(8732, 2, 2)).astype(np.float32)
    gt = np.concatenate([pts.min(axis=1), pts.max(axis=1) + 0.01], axis=-1)
    gt = np.clip(gt, 0, 1)
    deltas = box_ops.encode(anchors, jnp.asarray(gt), cfg.variances)
    back = box_ops.decode(anchors, deltas, cfg.variances)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-4)


def test_encode_handcomputed():
    """Anchor == gt -> zero deltas; simple shift -> known deltas."""
    anchors = jnp.asarray([[0.2, 0.2, 0.6, 0.6]], jnp.float32)
    variances = (0.1, 0.1, 0.2, 0.2)
    d0 = box_ops.encode(anchors, anchors, variances)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)
    # gt shifted +0.1 in y (anchor h = 0.4): dcy = 0.1/0.4/0.1 = 2.5
    gt = jnp.asarray([[0.3, 0.2, 0.7, 0.6]], jnp.float32)
    d1 = np.asarray(box_ops.encode(anchors, gt, variances))
    np.testing.assert_allclose(d1[0], [2.5, 0.0, 0.0, 0.0], atol=1e-5)


def test_encode_zero_gt_guarded():
    anchors = jnp.asarray([[0.2, 0.2, 0.6, 0.6]], jnp.float32)
    zero = jnp.zeros((1, 4), jnp.float32)
    d = box_ops.encode(anchors, zero, (0.1, 0.1, 0.2, 0.2))
    assert np.all(np.isfinite(np.asarray(d)))
    np.testing.assert_allclose(np.asarray(d), 0.0)


def test_center_corner_conversions_inverse():
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 1, size=(100, 2, 2)).astype(np.float32)
    boxes = jnp.asarray(
        np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1))
    back = box_ops.to_corners(box_ops.to_centers(boxes))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-6)


def test_normalize_denormalize():
    boxes = jnp.asarray([[10.0, 20.0, 110.0, 220.0]])
    norm = box_ops.normalize_bboxes(boxes, 200.0, 400.0)
    np.testing.assert_allclose(np.asarray(norm), [[0.05, 0.05, 0.55, 0.55]])
    back = box_ops.denormalize_bboxes(norm, 200.0, 400.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes))


def test_get_hyper_params_overrides_and_errors():
    cfg = get_hyper_params("vgg16", neg_pos_ratio=5)
    assert cfg.neg_pos_ratio == 5
    with pytest.raises(ValueError):
        get_hyper_params("resnet50")
