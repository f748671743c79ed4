"""A/B suppression + gather + top_k variants on the real TPU.

Run from the repo root (TPU): python tools/nms_ab.py
Records the measurements that pick combined_nms's default implementation
(see ARCHITECTURE.md perf notes).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _time_fn
from tfssd_tpu import get_hyper_params
from tfssd_tpu.models import get_model, init_model
from tfssd_tpu.models.decoder import decode_predictions
from tfssd_tpu.ops import boxes as box_ops
from tfssd_tpu.ops.nms import _greedy_keep, _greedy_keep_blocked, combined_nms

B, C, K = 256, 20, 200
M = B * C


def report(name, dt, imgs=B):
    print(f"{name:44s} {dt * 1e3:9.3f} ms  ({imgs / dt:9.1f} img/s)")


def candidates(spread):
    """Score-sorted candidate sets; small spread => heavy overlap."""
    rng = np.random.default_rng(1)
    c = rng.uniform(0.35, 0.65, (M, K, 2)) * spread + 0.2
    wh = rng.uniform(0.05, 0.5, (M, K, 2)) * max(spread, 0.3)
    bx = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    sc = -np.sort(-rng.uniform(0, 1, (M, K)).astype(np.float32), axis=-1)
    return jnp.asarray(bx), jnp.asarray(sc > 0.01)


def main():
    iters = 20
    for spread, tag in ((1.0, "spread"), (0.08, "overlapping")):
        bx, valid = candidates(spread)

        def fix(bx, valid):
            ious = box_ops.iou_matrix(bx, bx)
            return jax.vmap(lambda io, v: _greedy_keep(io, v, 0.45))(
                ious, valid)
        f = jax.jit(fix)
        report(f"suppress fixpoint [{tag}]",
               _time_fn(f, (bx, valid), iters))

        for blk in (64, 128):
            g = jax.jit(lambda bx, valid, blk=blk: _greedy_keep_blocked(
                bx, valid, 0.45, block=blk))
            np.testing.assert_array_equal(
                np.asarray(f(bx, valid)), np.asarray(g(bx, valid)))
            report(f"suppress blocked-{blk} [{tag}]",
                   _time_fn(g, (bx, valid), iters))

    # end-to-end: full predict path, random weights (the bench's shape)
    cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    from tfssd_tpu.ops.boxes import generate_anchors
    anchors = jnp.asarray(generate_anchors(cfg))
    images = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (B, cfg.img_size, cfg.img_size, 3)), jnp.float32)

    for impl in ("xla", "blocked"):
        def full(v, x, impl=impl):
            deltas, logits = model.apply(v, x, train=False)
            boxes = box_ops.clip_boxes(
                box_ops.decode(anchors, deltas, cfg.variances))
            scores = jax.nn.softmax(logits, axis=-1)[..., 1:]
            return combined_nms(
                boxes, scores,
                max_detections_per_class=cfg.max_detections_per_class,
                max_total_detections=cfg.max_total_detections,
                iou_threshold=cfg.nms_iou_threshold,
                score_threshold=cfg.nms_score_threshold, impl=impl)
        fn = jax.jit(full)
        report(f"full predict impl={impl}",
               _time_fn(fn, (variables, images), iters))


if __name__ == "__main__":
    main()
