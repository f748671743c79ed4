"""Box geometry primitives: anchors (prior boxes), IoU, delta encode/decode.

Reference parity: utils/bbox_utils.py — generate_prior_boxes,
generate_iou_map, get_deltas_from_bboxes, get_bboxes_from_deltas,
normalize_bboxes/denormalize_bboxes (pure-function layer, SURVEY.md §2 #8).

TPU-first design notes:
  * Anchor generation runs once on the host in float64-free numpy and is
    closed over by the jitted step as a constant — it never recomputes
    per batch the way the reference's eager path allows.
  * IoU / encode / decode are pure `jnp` functions with broadcasting-first
    signatures so they vmap cleanly over batch and fuse into the train
    step under jit (the reference computes IoU per batch *outside* its
    compiled step — its single biggest structural inefficiency).
  * All boxes are normalized corner form [ymin, xmin, ymax, xmax] in [0, 1]
    (the reference's convention). Center form is [cy, cx, h, w].
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tfssd_tpu.config import SSDConfig

Array = jnp.ndarray

EPS = 1e-8


# ---------------------------------------------------------------------------
# Anchor (prior box) generation — host-side, numpy, deterministic.
# ---------------------------------------------------------------------------


def generate_base_anchors(
    scale: float, next_scale: float, aspect_ratios: Sequence[float]
) -> np.ndarray:
    """Per-cell (h, w) pairs for one feature map.

    One box per aspect ratio at `scale` plus the SSD paper's extra ar=1 box
    at sqrt(scale * next_scale). Returns (A, 2) array of (h, w).
    """
    hw = []
    for ar in aspect_ratios:
        r = math.sqrt(ar)
        hw.append((scale / r, scale * r))  # (h, w): w = s*sqrt(ar)
    s_prime = math.sqrt(scale * next_scale)
    hw.append((s_prime, s_prime))
    return np.asarray(hw, dtype=np.float32)


def generate_anchors(config: SSDConfig) -> np.ndarray:
    """All prior boxes for a config, normalized [ymin, xmin, ymax, xmax].

    Reference parity: bbox_utils.generate_prior_boxes(feature_map_shapes,
    aspect_ratios) — centers at (i + 0.5) / f_k, clipped to [0, 1].
    Returns (total_anchors, 4) float32; 8732 rows for SSD300-VGG16.
    """
    scales = config.map_scales
    out = []
    for k, fm in enumerate(config.feature_map_shapes):
        hw = generate_base_anchors(scales[k], scales[k + 1],
                                   config.aspect_ratios[k])  # (A, 2)
        centers = (np.arange(fm, dtype=np.float32) + 0.5) / fm
        cy, cx = np.meshgrid(centers, centers, indexing="ij")  # (fm, fm)
        cy = cy[:, :, None]  # (fm, fm, 1)
        cx = cx[:, :, None]
        h = hw[None, None, :, 0]  # (1, 1, A)
        w = hw[None, None, :, 1]
        boxes = np.stack(
            [cy - h / 2.0, cx - w / 2.0, cy + h / 2.0, cx + w / 2.0],
            axis=-1,
        )  # (fm, fm, A, 4)
        out.append(boxes.reshape(-1, 4))
    anchors = np.concatenate(out, axis=0)
    assert anchors.shape[0] == config.total_anchors, (
        anchors.shape, config.total_anchors)
    return np.clip(anchors, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Corner <-> center conversions.
# ---------------------------------------------------------------------------


def to_centers(boxes: Array) -> Array:
    """[..., (ymin,xmin,ymax,xmax)] -> [..., (cy,cx,h,w)]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    return jnp.concatenate([ymin + h / 2.0, xmin + w / 2.0, h, w], axis=-1)


def to_corners(boxes: Array) -> Array:
    """[..., (cy,cx,h,w)] -> [..., (ymin,xmin,ymax,xmax)]."""
    cy, cx, h, w = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cy - h / 2.0, cx - w / 2.0, cy + h / 2.0, cx + w / 2.0], axis=-1
    )


def area(boxes: Array) -> Array:
    """Area of [..., 4] corner boxes -> [...]."""
    h = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    w = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return h * w


# ---------------------------------------------------------------------------
# Pairwise IoU.
# ---------------------------------------------------------------------------


def iou_matrix(boxes_a: Array, boxes_b: Array) -> Array:
    """Broadcast pairwise IoU.

    Reference parity: bbox_utils.generate_iou_map(bboxes, gt_boxes).

    boxes_a: [..., A, 4], boxes_b: [..., B, 4]  ->  [..., A, B].
    Zero-area (padded) boxes produce IoU 0.
    """
    a = boxes_a[..., :, None, :]  # [..., A, 1, 4]
    b = boxes_b[..., None, :, :]  # [..., 1, B, 4]
    inter_min = jnp.maximum(a[..., :2], b[..., :2])
    inter_max = jnp.minimum(a[..., 2:], b[..., 2:])
    inter_hw = jnp.maximum(inter_max - inter_min, 0.0)
    inter = inter_hw[..., 0] * inter_hw[..., 1]
    union = area(boxes_a)[..., :, None] + area(boxes_b)[..., None, :] - inter
    return inter / jnp.maximum(union, EPS)


# ---------------------------------------------------------------------------
# Delta encode / decode (with variances).
# ---------------------------------------------------------------------------


def encode(anchors: Array, boxes: Array,
           variances: Tuple[float, float, float, float]) -> Array:
    """Corner boxes -> regression deltas relative to anchors.

    Reference parity: bbox_utils.get_deltas_from_bboxes followed by the
    division by variances done in train_utils.calculate_actual_outputs.
    Delta layout [dcy, dcx, dh, dw]; zero-size gt guarded to zero deltas.
    """
    anc = to_centers(anchors)
    gt = to_centers(boxes)
    acy, acx, ah, aw = (anc[..., i] for i in range(4))
    gcy, gcx, gh, gw = (gt[..., i] for i in range(4))
    valid = (gh > EPS) & (gw > EPS)
    gh_safe = jnp.where(valid, gh, 1.0)
    gw_safe = jnp.where(valid, gw, 1.0)
    dcy = (gcy - acy) / jnp.maximum(ah, EPS)
    dcx = (gcx - acx) / jnp.maximum(aw, EPS)
    dh = jnp.log(gh_safe / jnp.maximum(ah, EPS))
    dw = jnp.log(gw_safe / jnp.maximum(aw, EPS))
    deltas = jnp.stack([dcy, dcx, dh, dw], axis=-1)
    deltas = jnp.where(valid[..., None], deltas, 0.0)
    v = jnp.asarray(variances, dtype=deltas.dtype)
    return deltas / v


def decode(anchors: Array, deltas: Array,
           variances: Tuple[float, float, float, float]) -> Array:
    """Regression deltas -> corner boxes (inverse of `encode`).

    Reference parity: bbox_utils.get_bboxes_from_deltas with the variance
    multiply from models/decoder.py.
    """
    v = jnp.asarray(variances, dtype=deltas.dtype)
    d = deltas * v
    anc = to_centers(anchors)
    acy, acx, ah, aw = (anc[..., i] for i in range(4))
    cy = d[..., 0] * ah + acy
    cx = d[..., 1] * aw + acx
    h = jnp.exp(d[..., 2]) * ah
    w = jnp.exp(d[..., 3]) * aw
    return to_corners(jnp.stack([cy, cx, h, w], axis=-1))


def clip_boxes(boxes: Array, low: float = 0.0, high: float = 1.0) -> Array:
    return jnp.clip(boxes, low, high)


def normalize_bboxes(boxes: Array, height: float, width: float) -> Array:
    """Pixel corner boxes -> normalized (reference bbox_utils.normalize_bboxes)."""
    scale = jnp.asarray([height, width, height, width], dtype=boxes.dtype)
    return boxes / scale


def denormalize_bboxes(boxes: Array, height: float, width: float) -> Array:
    """Normalized corner boxes -> pixels (reference denormalize_bboxes)."""
    scale = jnp.asarray([height, width, height, width], dtype=boxes.dtype)
    return boxes * scale


# ---------------------------------------------------------------------------
# Lanes-last ("transposed") decode for the TPU inference path.
# ---------------------------------------------------------------------------


def decode_to_planes(anchors: Array, deltas_t: Array,
                     variances: Tuple[float, float, float, float],
                     clip: bool = True):
    """Decode from lanes-last deltas: (B, 4, N) -> four (B, N) corner planes.

    Same math as `decode` (+ optional clip), but every array keeps the
    anchor axis in the TPU lane dimension. Arrays shaped (..., 4) put 4
    channels in lanes and get padded to 128 on TPU — a 32x physical
    blowup that made the reference-layout decode path memory-bound; the
    plane form removes every such tensor from the inference hot path.
    """
    anc = to_centers(anchors)          # (N, 4) — tiny, host-computed once
    acy, acx, ah, aw = anc[:, 0], anc[:, 1], anc[:, 2], anc[:, 3]
    v = variances
    cy = deltas_t[:, 0] * v[0] * ah + acy
    cx = deltas_t[:, 1] * v[1] * aw + acx
    h = jnp.exp(deltas_t[:, 2] * v[2]) * ah
    w = jnp.exp(deltas_t[:, 3] * v[3]) * aw
    y0, x0 = cy - h * 0.5, cx - w * 0.5
    y1, x1 = cy + h * 0.5, cx + w * 0.5
    if clip:
        y0, x0 = jnp.clip(y0, 0.0, 1.0), jnp.clip(x0, 0.0, 1.0)
        y1, x1 = jnp.clip(y1, 0.0, 1.0), jnp.clip(x1, 0.0, 1.0)
    return y0, x0, y1, x1
