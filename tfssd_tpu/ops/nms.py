"""Fixed-shape per-class NMS — the TPU replacement for
`tf.image.combined_non_max_suppression`.

Reference parity: utils/bbox_utils.py:non_max_suppression +
models/decoder.py (SURVEY.md §2 #6, #8): per-class greedy suppression at
IoU > nms_iou_threshold, at most `max_detections_per_class` survivors per
class, globally truncated to the `max_total_detections` highest-scoring
boxes, returned as (boxes, scores, classes, valid_count). Class ids here
are 0-BASED foreground indices (-1 on padding); the +1 background shift
the reference applies lives in models/decoder.py, the only caller that
feeds evaluation.

TPU-first design: `combined_non_max_suppression` has no XLA/TPU kernel, so
this is a fixed-shape formulation:

  1. per class: top-K candidates by score (K = max_detections_per_class),
  2. one K x K IoU matrix per (image, class) — a single fused broadcast,
  3. EXACT greedy suppression as a fixpoint iteration (`_greedy_keep`;
     O(chain depth) batched sweeps, not K serial steps — see its
     docstring and ARCHITECTURE.md),
  4. kept scores from all classes merged by a global top-K.

Everything is static-shape, batched over (batch, class), and jit/pjit
compatible. Stages 2-3 have three exact formulations selected by
`impl` (the decode path passes SSDConfig.nms_impl; default "blocked"):
"blocked" triangular solve, "xla" fixpoint matvec, and "pallas" (the
fused VMEM-resident kernel in ops/kernels/nms_keep.py — a measured
negative result, kept for the record). SSDConfig.use_pallas governs only
the train-time matcher, not this decode path.
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


# Widths up to this use the MXU one-hot gather; wider tables fall back
# to take_along_axis (the one-hot inner dimension grows with the table
# and the matmul stops paying for itself around ~1-2k rows).
_ONEHOT_GATHER_MAX = 1024


def _gather_rows(table: Array, idx: Array,
                 force_onehot: bool = False) -> Array:
    """(B, N, F) table gathered by (B, S) indices -> (B, S, F).

    TPU-first: for the post-prefilter widths the serving path uses
    (N <= _ONEHOT_GATHER_MAX), this is an MXU one-hot matmul in f32
    HIGHEST precision — EXACT (the one-hot row selects a single f32
    value; HIGHEST runs the dot in bf16x6 passes that reproduce f32)
    and measured 3.9x faster than take_along_axis (1.92 vs 7.45 ms for
    the b256 candidate gather: TPU's gather unit is serial, while XLA
    fuses the one-hot construction straight into MXU tiles so the
    (B, S, N) selector never round-trips HBM). Wide tables keep the
    gather path unless `force_onehot` (profitable again when S is small
    — e.g. the merge's 200-of-4000 payload pick).
    """
    b, n, f = table.shape
    if n > _ONEHOT_GATHER_MAX and not force_onehot:
        return jnp.take_along_axis(table, idx[..., None], axis=1)
    onehot = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)
              ).astype(table.dtype)                     # (B, S, N)
    return jnp.einsum("bsn,bnf->bsf", onehot, table,
                      precision=jax.lax.Precision.HIGHEST)


def _greedy_keep_sequential(ious: Array, valid: Array,
                            iou_threshold: float) -> Array:
    """Textbook greedy suppression: K sequential iterations (reference
    semantics oracle; O(K) serial steps — slow on TPU, kept for parity
    tests against `_greedy_keep`)."""
    k = ious.shape[0]
    later = jnp.arange(k)

    def body(i, keep):
        alive_i = keep[i]
        suppress = alive_i & (ious[i] > iou_threshold) & (later > i)
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)


def _greedy_keep(ious: Array, valid: Array, iou_threshold: float) -> Array:
    """EXACT greedy suppression as a fixpoint iteration (TPU-fast path).

    Greedy NMS is the unique solution of the score-order recurrence
        keep[j] = valid[j] and not any(keep[i] and iou[i,j] > t, i < j).
    Iterating the whole recurrence as a dense map from keep^(n) converges
    to that fixed point: even/odd iterates form monotone decreasing/
    increasing sequences whose limits must coincide (induction over score
    rank shows any limit pair (a, f(a)=b) has a == b). Convergence takes
    O(longest suppression chain) iterations — single digits on real
    detections — instead of the K serial steps of the textbook loop, and
    each iteration is one masked-matrix matvec that the MXU eats whole
    when vmapped over (batch, class). A K-iteration cap guarantees exact
    greedy in the worst case.

    ious: (K, K) pairwise IoU of score-sorted candidates; valid: (K,).
    """
    k = ious.shape[0]
    idx = jnp.arange(k)
    # S[i, j]: candidate i (higher score) would suppress j. int8 halves the
    # HBM traffic per fixpoint sweep vs bf16/f32 (measured ~1.7x faster on
    # v5e); hit counts <= K fit int32 exactly.
    suppress = ((ious > iou_threshold) & (idx[:, None] < idx[None, :])
                ).astype(jnp.int8)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        hit = jnp.matmul(keep.astype(jnp.int8), suppress,
                         preferred_element_type=jnp.int32)
        return (valid & (hit == 0), keep, it + 1)

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.zeros((), jnp.int32)))
    return keep


def _greedy_keep_blocked(boxes: Array, valid: Array, iou_threshold: float,
                         block: int = 64) -> Array:
    """EXACT greedy suppression by blocked forward substitution.

    The greedy recurrence keep[j] = valid[j] & !any(keep[i] & S[i,j], i<j)
    is a unit-triangular boolean solve. Solve it block by block in score
    order: within a diagonal block, an unrolled textbook sweep (each step
    elementwise on (M, block) — fused by XLA, one pass over the block);
    across blocks, accumulate suppression hits with one int8 matvec per
    block pair (every off-diagonal S tile is read exactly once, on the
    MXU). Unlike the fixpoint iteration (`_greedy_keep`), total work is
    DETERMINISTIC — one triangular pass over S — instead of
    O(longest suppression chain) full-matrix sweeps, which degrades to
    tens of 200x200 sweeps when candidates overlap heavily (near-uniform
    scores, e.g. early in training).

    boxes: (M, K, 4) score-sorted candidate corners (M = batch*classes
    flattened); valid: (M, K) bool. Returns (M, K) bool keep. IoU tiles
    are computed on the fly from corner planes — the full (M, K, K) IoU
    tensor is never materialized.
    """
    m, k, _ = boxes.shape
    nb = -(-k // block)
    kp = nb * block
    if kp != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, kp - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, kp - k)))
    # Materialize the inputs once: without the barrier XLA duplicates the
    # producer (the candidate gather) into every one of the O(nb^2) IoU
    # tiles and the unrolled sweeps, exploding compile time.
    boxes, valid = jax.lax.optimization_barrier((boxes, valid))
    y0, x0, y1, x1 = (boxes[..., i] for i in range(4))

    def iou_tile(rows, cols):
        """(M, block, block) IoU of row-block candidates vs col-block."""
        ra, ca = slice(rows * block, (rows + 1) * block), \
            slice(cols * block, (cols + 1) * block)
        iy0 = jnp.maximum(y0[:, ra, None], y0[:, None, ca])
        ix0 = jnp.maximum(x0[:, ra, None], x0[:, None, ca])
        iy1 = jnp.minimum(y1[:, ra, None], y1[:, None, ca])
        ix1 = jnp.minimum(x1[:, ra, None], x1[:, None, ca])
        inter = (jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0))
        area = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
        union = area[:, ra, None] + area[:, None, ca] - inter
        return inter / jnp.maximum(union, 1e-8)

    idx = jnp.arange(block)
    upper = idx[:, None] < idx[None, :]          # strict: i suppresses j>i

    kept_blocks = []
    # hits[l]: int32 (M, block) suppression count flowing into block l
    # from already-solved blocks.
    hits = [jnp.zeros((m, block), jnp.int32) for _ in range(nb)]
    for bi in range(nb):
        sb = (iou_tile(bi, bi) > iou_threshold) & upper
        keep = (valid[:, bi * block:(bi + 1) * block]
                & (hits[bi] == 0))
        for i in range(block):                   # unrolled textbook sweep
            keep = keep & ~(keep[:, i:i + 1] & sb[:, i, :])
        kept_blocks.append(keep)
        keep8 = keep.astype(jnp.int8)[:, None, :]        # (M, 1, block)
        for later in range(bi + 1, nb):
            s_cross = (iou_tile(bi, later) > iou_threshold).astype(jnp.int8)
            hits[later] = hits[later] + jnp.matmul(
                keep8, s_cross,
                preferred_element_type=jnp.int32)[:, 0, :]
    return jnp.concatenate(kept_blocks, axis=1)[:, :k]


def _merge_detections(top_scores, keep, flat_boxes, num_classes: int,
                      k: int, max_total_detections: int) -> NMSResult:
    """Global cross-class merge: flatten per-class survivors, take the
    top max_total by score, mask/pad the padding rows. `top_scores` is
    (B, C, K) raw candidate scores, `keep` the (B, C, K) bool survivor
    mask, `flat_boxes` the (B, C*K, 4) candidate boxes in flat order.

    Suppressed rows are sunk with a -inf sentinel and validity is the
    GATHERED keep mask, not a score sign test: scores may legitimately
    be negative (tf.image.combined_non_max_suppression semantics allow
    any score_threshold, e.g. -inf with margin/logit scores), and an
    earlier `score > 0` validity test let zeroed suppressed rows
    outrank kept negative-score detections.

    The top_k SORT KEY clamps kept scores to >= -finfo.max so a kept
    row whose raw score is exactly -inf still strictly outranks every
    -inf suppression sentinel (top_k breaks ties by position, which
    would otherwise let a suppressed row sort ahead of it); the
    REPORTED score is regathered from the raw candidates so the output
    stays exact even in that corner.

    TPU-first: boxes + keep + class ids are gathered in ONE fused
    one-hot MXU matmul over a (B, C*K, 6) payload (exact: clipped
    boxes, 0/1 keep, small-int classes are all finite f32; see
    _gather_rows). The raw score column stays a take_along_axis — a
    payload column holding -inf would turn the matmul's 0 x inf into
    NaN."""
    b = top_scores.shape[0]
    ck = num_classes * k
    flat_keep = keep.reshape(b, -1)                     # (B, C*K)
    flat_raw = top_scores.reshape(b, -1)
    neg = jnp.asarray(-jnp.inf, top_scores.dtype)
    lo = jnp.asarray(jnp.finfo(top_scores.dtype).min, top_scores.dtype)
    flat_key = jnp.where(flat_keep, jnp.maximum(flat_raw, lo), neg)
    flat_classes = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.float32)[:, None],
        (num_classes, k)).reshape(1, -1)

    total = min(max_total_detections, ck)
    _, sel = jax.lax.top_k(flat_key, total)
    payload = jnp.concatenate([
        flat_boxes,
        flat_keep[..., None].astype(jnp.float32),
        jnp.broadcast_to(flat_classes, (b, ck))[..., None],
    ], axis=-1)                                         # (B, C*K, 6)
    picked = _gather_rows(payload, sel, force_onehot=True)
    ok = picked[..., 4] > 0.5
    final_scores = jnp.where(ok, jnp.take_along_axis(flat_raw, sel, axis=1),
                             0.0)
    final_classes = jnp.where(ok, picked[..., 5].astype(jnp.int32), -1)
    final_boxes = jnp.where(ok[..., None], picked[..., :4], 0.0)
    pad = max_total_detections - total
    if pad:
        final_scores = jnp.pad(final_scores, ((0, 0), (0, pad)))
        final_classes = jnp.pad(final_classes, ((0, 0), (0, pad)),
                                constant_values=-1)
        final_boxes = jnp.pad(final_boxes, ((0, 0), (0, pad), (0, 0)))
    return NMSResult(
        boxes=final_boxes,
        scores=final_scores,
        classes=final_classes,
        valid=jnp.sum(ok.astype(jnp.int32), axis=-1),
    )


def combined_nms(
    boxes: Array,        # (B, N, 4) decoded normalized corners
    scores: Array,       # (B, N, C) per-class foreground scores (no bg col)
    max_detections_per_class: int = 200,
    max_total_detections: int = 200,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
    impl: str = "blocked",  # "blocked" (triangular solve, default) |
                            # "xla" (fixpoint matvec) | "pallas" (kernel)
    prefilter_anchors: int = 0,   # 0 = exact; M>0 keeps only the top-M
                                  # anchors per image by max class score
                                  # before the per-class stages
) -> NMSResult:
    """Batched combined (per-class) NMS; see module docstring.

    Written as flat batched stages over the (B, C) leading axes — one
    top_k, one gather, one IoU broadcast, one suppression solve, one
    final top_k — rather than nested per-image/per-class closures, so XLA
    tiles each stage across the whole batch.

    prefilter_anchors=M > 0 inserts a class-agnostic candidate cut: one
    cheap B-row top_k keeps the M anchors with the highest max-over-class
    score, and every per-class stage then runs at width M instead of N.
    Near-exact, not exact: an anchor outside the top M by max score could
    still rank in some class's top candidates — but only with a class
    score below the M-th best anchor's best score, i.e. deep in the junk
    tail (never among real detections). The exactness-sensitive tests and
    parity oracles run with the default 0.
    """
    b, n, num_classes = scores.shape
    if 0 < prefilter_anchors < n:
        m = prefilter_anchors
        _, sel = jax.lax.top_k(jnp.max(scores, axis=-1), m)    # (B, M)
        # One fused one-hot matmul gathers scores AND boxes; exact, and
        # measured 1.7 vs 2.9 ms against the two take_along_axis gathers
        # at b256 on the original C+4-column payload — the 3C+4 widening
        # below (inf-mask columns) left the end-to-end headline
        # unchanged (11.9-12.2k img/s band before and after; the
        # selector construction fuses into MXU tiles either way).
        # Scores may be +-inf (the module's
        # documented margin/logit semantics), and inf through a matmul
        # NaN-poisons every picked row (0 x inf = NaN) — so the payload
        # carries the FINITE part plus exact 0/1 +-inf mask columns and
        # reconstructs the infinities after the pick.
        neg_m = jnp.isneginf(scores)
        pos_m = jnp.isposinf(scores)
        finite = jnp.where(neg_m | pos_m, 0.0, scores)
        payload = jnp.concatenate([
            finite, neg_m.astype(scores.dtype), pos_m.astype(scores.dtype),
            boxes], axis=-1)                     # (B, N, 3C+4)
        picked = _gather_rows(payload, sel, force_onehot=True)
        c = num_classes
        inf = jnp.asarray(jnp.inf, scores.dtype)
        scores = jnp.where(
            picked[..., c:2 * c] > 0.5, -inf,
            jnp.where(picked[..., 2 * c:3 * c] > 0.5, inf,
                      picked[..., :c]))
        boxes = picked[..., 3 * c:]
        n = m
    k = min(max_detections_per_class, n)

    # Per-class top-K candidates: (B, C, K).
    top_scores, top_idx = jax.lax.top_k(
        jnp.swapaxes(scores, 1, 2), k)              # over the anchor axis
    top_boxes = _gather_rows(boxes, top_idx.reshape(b, -1)
                             ).reshape(b, num_classes, k, 4)
    valid = top_scores > score_threshold

    if impl == "pallas":
        # Fused VMEM-resident IoU + suppression kernel (ops/kernels/).
        from tfssd_tpu.ops.kernels.nms_keep import nms_keep_pallas

        keep = nms_keep_pallas(
            top_boxes.reshape(-1, k, 4), top_scores.reshape(-1, k),
            iou_threshold, score_threshold,
        ).reshape(b, num_classes, k)
    elif impl == "blocked":
        keep = _greedy_keep_blocked(
            top_boxes.reshape(-1, k, 4), valid.reshape(-1, k),
            iou_threshold,
        ).reshape(b, num_classes, k)
    else:
        # Pairwise IoU per (image, class): (B, C, K, K), in f32. A bf16
        # variant was ~2 ms faster at batch 256 but bf16's ~0.004
        # absolute resolution near coordinate 1.0 corrupts IoU for small
        # boxes by tens of percent (a 0.02-wide box gets corner rounding
        # of up to 20% of its width) — wrong suppression flips, so
        # exactness wins.
        ious = box_ops.iou_matrix(top_boxes, top_boxes)
        keep = jax.vmap(jax.vmap(
            lambda io, v: _greedy_keep(io, v, iou_threshold)))(ious, valid)

    return _merge_detections(
        top_scores, keep, top_boxes.reshape(b, -1, 4),
        num_classes, k, max_total_detections)


def _iou_from_planes(y0, x0, y1, x1):
    """Pairwise IoU (..., K, K) from four (..., K) corner planes."""
    iy0 = jnp.maximum(y0[..., :, None], y0[..., None, :])
    ix0 = jnp.maximum(x0[..., :, None], x0[..., None, :])
    iy1 = jnp.minimum(y1[..., :, None], y1[..., None, :])
    ix1 = jnp.minimum(x1[..., :, None], x1[..., None, :])
    inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
    a = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
    union = a[..., :, None] + a[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def combined_nms_planes(
    planes,              # (y0, x0, y1, x1), each (B, N) lanes-last
    scores_t: Array,     # (B, C, N) per-class foreground scores
    max_detections_per_class: int = 200,
    max_total_detections: int = 200,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
) -> NMSResult:
    """combined_nms in lanes-last form — identical keep semantics, no
    (..., 4)-shaped tensor anywhere in the hot path (see decode_to_planes).
    IoU is computed in f32 (the layout win already removed the bandwidth
    pressure that motivated bf16 in the reference-layout path)."""
    b, num_classes, n = scores_t.shape
    k = min(max_detections_per_class, n)

    top_scores, top_idx = jax.lax.top_k(scores_t, k)       # (B, C, K)
    flat_idx = top_idx.reshape(b, -1)                      # (B, C*K)
    tp = [jnp.take_along_axis(p, flat_idx, axis=1).reshape(b, num_classes, k)
          for p in planes]                                 # 4 x (B, C, K)
    valid = top_scores > score_threshold

    ious = _iou_from_planes(*tp)                           # (B, C, K, K)
    keep = jax.vmap(jax.vmap(
        lambda io, v: _greedy_keep(io, v, iou_threshold)))(ious, valid)

    return _merge_detections(
        top_scores, keep,
        jnp.stack([p.reshape(b, -1) for p in tp], axis=-1),
        num_classes, k, max_total_detections)
