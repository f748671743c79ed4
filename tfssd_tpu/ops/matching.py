"""Ground-truth matching and target encoding — fused into the jitted step.

Reference parity: utils/train_utils.py:calculate_actual_outputs (SURVEY.md
§3.4). The reference runs this per batch in a Python generator *outside*
its compiled train step; here it is a pure function that lives inside
`train_step` under jit, so the IoU matrix, argmax matching, delta encoding
and one-hot label construction all fuse into the compiled program and the
host never touches per-batch target tensors.

Semantics (mirroring the reference):
  1. iou = IoU(anchors[N], gt[G])                       -> (N, G)
  2. best_iou / best_gt = max / argmax over G           -> (N,)
  3. positive = best_iou > iou_threshold (0.5); padded gt rows have zero
     area -> IoU 0 -> never matched.
  4. deltas = encode(anchors, gt[best_gt]) / variances, zeroed for negatives
  5. labels = one_hot(gt_label[best_gt]) for positives else background(0)

Optional paper-faithful extension (config.force_match_for_gt, default off
to match the reference's threshold-only behaviour): each valid gt's single
best anchor is forced positive even below the threshold.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tfssd_tpu.config import SSDConfig
from tfssd_tpu.ops import boxes as box_ops

Array = jnp.ndarray


def match_single(
    anchors: Array,      # (N, 4) normalized corners
    gt_boxes: Array,     # (G, 4) normalized corners, zero-padded
    gt_labels: Array,    # (G,) int32 in [1, total_labels); 0 on padded rows
    config: SSDConfig,
) -> Tuple[Array, Array]:
    """Targets for one image: (deltas (N, 4), labels one-hot (N, L))."""
    iou = box_ops.iou_matrix(anchors, gt_boxes)  # (N, G)
    gt_valid = gt_labels > 0
    # Padded rows have zero area so IoU is already 0, but mask explicitly so
    # a degenerate "real" box can never be matched either.
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    best_iou = jnp.max(iou, axis=-1)      # (N,)
    best_gt = jnp.argmax(iou, axis=-1)    # (N,)
    positive = best_iou > config.iou_threshold

    if config.force_match_for_gt:
        # Paper's bipartite step: each valid gt's argmax anchor is forced
        # positive. Padded gts share best_anchor==argmax(all-zero column)
        # with real gts, so plain .at[].set scatters would race on
        # duplicate indices (unspecified winner). Use commutative
        # reductions instead: OR (max) for the forced mask, MIN over
        # claiming gt indices for a deterministic tie-break.
        # A gt whose IoU column is all zero (zero-area/out-of-frame box
        # that still carries a label) must NOT force: its argmax is a
        # meaningless anchor 0 and the module invariant says degenerate
        # boxes are never matched.
        g = gt_boxes.shape[0]
        can_force = gt_valid & (jnp.max(iou, axis=0) > 0.0)    # (G,)
        best_anchor = jnp.argmax(iou, axis=0)  # (G,)
        forced = jnp.zeros_like(positive).at[best_anchor].max(can_force)
        positive = positive | forced
        claiming = jnp.where(can_force, jnp.arange(g), g)
        claimed_gt = jnp.full_like(best_gt, g).at[best_anchor].min(claiming)
        best_gt = jnp.where(claimed_gt < g, claimed_gt, best_gt)

    matched_boxes = gt_boxes[best_gt]     # (N, 4)
    deltas = box_ops.encode(anchors, matched_boxes, config.variances)
    deltas = jnp.where(positive[:, None], deltas, 0.0)

    matched_labels = jnp.where(positive, gt_labels[best_gt], 0)
    labels = jax.nn.one_hot(matched_labels, config.total_labels,
                            dtype=deltas.dtype)
    return deltas, labels


def match_batch(
    anchors: Array,      # (N, 4)
    gt_boxes: Array,     # (B, G, 4)
    gt_labels: Array,    # (B, G)
    config: SSDConfig,
) -> Tuple[Array, Array]:
    """Batched targets: (deltas (B, N, 4), labels (B, N, L)).

    Reference parity: train_utils.calculate_actual_outputs — but vmapped
    and jit-fusable instead of eager per-batch host work.
    """
    return jax.vmap(lambda b, l: match_single(anchors, b, l, config))(
        gt_boxes, gt_labels
    )
