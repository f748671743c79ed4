"""SSD multibox loss: masked smooth-L1 + hard-negative-mined cross entropy.

Reference parity: ssd_loss.py:CustomLoss (SURVEY.md §2 #7, §3.5):
  * loc_loss_fn — Huber(actual_deltas, pred_deltas) summed over the 4
    coords, positives only, normalized per image by max(1, #pos),
    scaled by loc_loss_alpha (=1).
  * conf_loss_fn — categorical cross entropy per anchor; positives kept;
    negatives sorted by loss and the top `neg_pos_ratio (=3) * #pos`
    per image kept; normalized per image by max(1, #pos).

TPU-first deviations (same math, better numerics/fusion):
  * The model emits LOGITS; cross entropy uses a fused log-softmax instead
    of the reference's CE-on-softmax-probabilities. Softmax is applied only
    in the decode/predict path.
  * Hard-negative selection is a rank threshold computed from a single
    descending sort over the anchor axis (O(N log N) on the VPU) instead
    of a per-image dynamic top_k: rank(loss) < 3 * #pos. This is exactly
    the reference's selection set with static shapes, which is what jit
    wants. (No Pallas variant: the double argsort is XLA's own sort,
    already competitive — see ops/kernels/ for the ops that did earn
    kernels.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def huber(x: Array, delta: float = 1.0) -> Array:
    """Elementwise smooth-L1 (Huber) on residuals."""
    absx = jnp.abs(x)
    quad = 0.5 * x * x
    lin = delta * (absx - 0.5 * delta)
    return jnp.where(absx <= delta, quad, lin)


def localization_loss(
    actual_deltas: Array,   # (B, N, 4) — zero on negatives
    pred_deltas: Array,     # (B, N, 4)
    positive_mask: Array,   # (B, N) bool
    loc_loss_alpha: float = 1.0,
) -> Array:
    """Per-batch scalar loc loss (reference CustomLoss.loc_loss_fn)."""
    per_coord = huber(pred_deltas - actual_deltas.astype(pred_deltas.dtype))
    per_anchor = jnp.sum(per_coord, axis=-1)                    # (B, N)
    per_anchor = jnp.where(positive_mask, per_anchor, 0.0)
    pos = jnp.sum(positive_mask, axis=-1).astype(per_anchor.dtype)  # (B,)
    per_image = jnp.sum(per_anchor, axis=-1) / jnp.maximum(pos, 1.0)
    return loc_loss_alpha * jnp.mean(per_image)


def rank_descending(values: Array) -> Array:
    """Rank of each element under a descending sort along axis -1 (0 = largest;
    ties broken by index)."""
    order = jnp.argsort(-values, axis=-1)
    return jnp.argsort(order, axis=-1)


def confidence_loss(
    actual_labels: Array,   # (B, N, L) one-hot, bg = column 0
    pred_logits: Array,     # (B, N, L)
    neg_pos_ratio: int = 3,
    positive: Array = None,  # (B, N) bool; derived from labels if None
) -> Array:
    """Per-batch scalar conf loss with hard-negative mining
    (reference CustomLoss.conf_loss_fn). `positive` lets ssd_losses pass
    ONE positive-anchor mask to both loss terms — a future change to the
    positive definition (e.g. an ignore band) then has a single home."""
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(actual_labels * logp, axis=-1)          # (B, N)

    if positive is None:
        positive = jnp.sum(actual_labels[..., 1:], axis=-1) > 0.5  # (B, N)
    pos_count = jnp.sum(positive, axis=-1)                     # (B,)

    neg_ce = jnp.where(positive, -jnp.inf, ce)  # positives never selected as neg
    neg_rank = rank_descending(neg_ce)                         # (B, N)
    num_neg = neg_pos_ratio * pos_count                        # (B,)
    hard_negative = (~positive) & (neg_rank < num_neg[:, None])

    selected = jnp.where(positive | hard_negative, ce, 0.0)
    per_image = jnp.sum(selected, axis=-1) / jnp.maximum(
        pos_count.astype(ce.dtype), 1.0
    )
    return jnp.mean(per_image)


def ssd_losses(
    actual_deltas: Array,
    actual_labels: Array,
    pred_deltas: Array,
    pred_logits: Array,
    neg_pos_ratio: int = 3,
    loc_loss_alpha: float = 1.0,
) -> Tuple[Array, Dict[str, Array]]:
    """Total SSD loss and a metrics dict (loc/conf components)."""
    positive = jnp.sum(actual_labels[..., 1:], axis=-1) > 0.5
    loc = localization_loss(actual_deltas, pred_deltas, positive,
                            loc_loss_alpha)
    conf = confidence_loss(actual_labels, pred_logits, neg_pos_ratio,
                           positive=positive)
    total = loc + conf
    return total, {
        "loss": total,
        "loc_loss": loc,
        "conf_loss": conf,
        "num_pos": jnp.sum(positive).astype(jnp.float32),
    }
