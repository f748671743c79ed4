"""Fixed-shape per-class NMS — the TPU replacement for
`tf.image.combined_non_max_suppression`.

Reference parity: utils/bbox_utils.py:non_max_suppression +
models/decoder.py (SURVEY.md §2 #6, #8): per-class greedy suppression at
IoU > nms_iou_threshold, at most `max_detections_per_class` survivors per
class, globally truncated to the `max_total_detections` highest-scoring
boxes, returned as (boxes, scores, classes, valid_count) with class ids
shifted +1 for the background offset.

TPU-first design: `combined_non_max_suppression` has no XLA/TPU kernel, so
this is the classic fixed-shape greedy algorithm:

  1. per class: top-K candidates by score (K = max_detections_per_class),
  2. one K x K IoU matrix per (image, class) — a single fused broadcast,
  3. greedy suppression as a `lax.fori_loop` over the K sorted candidates
     updating a keep mask (each iteration is one VPU-wide vector op),
  4. kept scores from all classes merged by a global top-K.

Everything is static-shape, vmapped over (batch, class), and jit/pjit
compatible. A fused Pallas variant lives in ops/kernels/nms_pallas.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tfssd_tpu.ops import boxes as box_ops

Array = jnp.ndarray


class NMSResult(NamedTuple):
    boxes: Array    # (B, max_total, 4) normalized corners, zeros on padding
    scores: Array   # (B, max_total), 0 on padding
    classes: Array  # (B, max_total) int32; class ids WITHOUT background, -1 pad
    valid: Array    # (B,) int32 number of valid rows


def _greedy_keep(ious: Array, valid: Array, iou_threshold: float) -> Array:
    """Greedy suppression over score-sorted candidates.

    ious: (K, K) pairwise IoU of sorted candidates; valid: (K,) bool
    candidates above the score floor. Returns (K,) keep mask.
    """
    k = ious.shape[0]
    later = jnp.arange(k)

    def body(i, keep):
        alive_i = keep[i]
        suppress = alive_i & (ious[i] > iou_threshold) & (later > i)
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)


def _nms_single_class(
    boxes: Array,        # (N, 4)
    scores: Array,       # (N,) one class's scores
    k: int,
    iou_threshold: float,
    score_threshold: float,
) -> tuple[Array, Array]:
    """Per-class NMS -> (kept_scores (K,), kept_boxes (K, 4)).

    Suppressed/invalid entries get score 0.
    """
    k = min(k, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    valid = top_scores > score_threshold
    ious = box_ops.iou_matrix(top_boxes, top_boxes)
    keep = _greedy_keep(ious, valid, iou_threshold)
    return jnp.where(keep, top_scores, 0.0), top_boxes


def combined_nms(
    boxes: Array,        # (B, N, 4) decoded normalized corners
    scores: Array,       # (B, N, C) per-class foreground scores (no bg col)
    max_detections_per_class: int = 200,
    max_total_detections: int = 200,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
) -> NMSResult:
    """Batched combined (per-class) NMS; see module docstring."""
    num_classes = scores.shape[-1]
    k = min(max_detections_per_class, boxes.shape[-2])

    def per_image(img_boxes: Array, img_scores: Array) -> NMSResult:
        # vmap over classes: scores (C, N) -> kept (C, K)
        kept_scores, kept_boxes = jax.vmap(
            lambda s: _nms_single_class(
                img_boxes, s, k, iou_threshold, score_threshold
            )
        )(img_scores.T)                       # (C, K), (C, K, 4)

        flat_scores = kept_scores.reshape(-1)             # (C*K,)
        flat_boxes = kept_boxes.reshape(-1, 4)
        flat_classes = jnp.repeat(jnp.arange(num_classes), k)

        total = min(max_total_detections, flat_scores.shape[0])
        final_scores, sel = jax.lax.top_k(flat_scores, total)
        ok = final_scores > 0.0
        final_scores = jnp.where(ok, final_scores, 0.0)
        final_classes = jnp.where(ok, flat_classes[sel], -1)
        final_boxes = jnp.where(ok[:, None], flat_boxes[sel], 0.0)
        pad = max_total_detections - total
        if pad:
            final_scores = jnp.pad(final_scores, (0, pad))
            final_classes = jnp.pad(final_classes, (0, pad),
                                    constant_values=-1)
            final_boxes = jnp.pad(final_boxes, ((0, pad), (0, 0)))
        return NMSResult(
            boxes=final_boxes,
            scores=final_scores,
            classes=final_classes,
            valid=jnp.sum(ok.astype(jnp.int32)),
        )

    return jax.vmap(per_image)(boxes, scores)
