"""Prediction decoding: deltas + logits -> final detections.

Reference parity: models/decoder.py (`get_decoder_model`) — variance
scaling, delta->box decode, clip to [0,1], softmax, drop the background
column, combined per-class NMS, labels shifted +1 for the background
offset. Here it is a pure function fused with the forward pass under one
jit instead of a wrapper Keras model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfssd_tpu.config import SSDConfig
from tfssd_tpu.ops import boxes as box_ops
from tfssd_tpu.ops.nms import (NMSResult, combined_nms,  # noqa: F401
                               combined_nms_planes)

Array = jnp.ndarray


def decode_predictions(
    anchors: Array,        # (N, 4)
    pred_deltas: Array,    # (B, N, 4)
    pred_logits: Array,    # (B, N, L) — raw logits, bg = column 0
    config: SSDConfig,
) -> NMSResult:
    """Decode + NMS. Returned `classes` use the reference's label space
    (1..L-1, i.e. background-shifted +1); padding rows are class 0/score 0.

    Implementation notes (all measured on v5e, batch 256):
      * Suppression defaults to the blocked triangular solve of ops.nms
        (config.nms_impl="blocked"), which moved the headline 5.7k ->
        8.9k img/s/chip over the fixpoint matvec ("xla"). Both batch
        every (image, class) instance per pass and beat the per-instance
        Pallas kernel (grid programs serialize on the single tensor
        core — ops/kernels/nms_keep.py has the numbers).
      * r5: fetch-bounded stage isolation showed this path GATHER-bound
        (candidate gather alone 7.5 ms of the 15.6 ms tail); the
        prefilter/candidate/merge gathers are now exact MXU one-hot
        matmuls (ops.nms._gather_rows), cutting decode+NMS to 7.0 ms
        and lifting the headline to 12.0k img/s/chip.
      * A lanes-last "plane form" rewrite of this whole chain
        (combined_nms_planes), motivated by the 128-lane padding of the
        (B, N, 4)/(B, N, L) tensors, measured 2.3x SLOWER end to end
        (2.6k vs 6.1k img/s) — XLA already fuses the reference-layout
        elementwise chain, and the plane form's per-plane gathers and
        f32 IoU materialization cost more than the padding it saved. It
        is kept in ops/nms.py as a tested alternative.
    config.use_pallas governs the matcher, where fusion does win.
    """
    boxes = box_ops.decode(anchors, pred_deltas, config.variances)
    boxes = box_ops.clip_boxes(boxes)
    scores = jax.nn.softmax(pred_logits, axis=-1)[..., 1:]  # drop background
    res = combined_nms(
        boxes,
        scores,
        max_detections_per_class=config.max_detections_per_class,
        max_total_detections=config.max_total_detections,
        iou_threshold=config.nms_iou_threshold,
        score_threshold=config.nms_score_threshold,
        impl=config.nms_impl,
        prefilter_anchors=config.nms_prefilter_anchors,
    )
    # Shift class ids back into the reference's 1-based label space.
    shifted = jnp.where(res.classes >= 0, res.classes + 1, 0)
    return NMSResult(boxes=res.boxes, scores=res.scores, classes=shifted,
                     valid=res.valid)


def make_predict_fn(model, anchors: Array, config: SSDConfig):
    """Build the fused forward+decode inference function (jit-ready).

    Mirror of reference `get_decoder_model(base_model, prior_boxes,
    hyper_params)` — returns `predict(variables, images) -> NMSResult`.
    """
    anchors = jnp.asarray(anchors)

    def predict(variables, images: Array) -> NMSResult:
        pred_deltas, pred_logits = model.apply(variables, images, train=False)
        return decode_predictions(anchors, pred_deltas, pred_logits, config)

    return predict
