"""Stage-level timing of the inference path on the real TPU.

Measures (streaming mode, CLAUDE.md: pipelined calls / wall-clock) each
stage of predict = forward -> decode -> softmax -> per-class top_k ->
IoU+suppress -> merge, to locate where the batch-256 step time goes.
Run from the repo root WITHOUT JAX_PLATFORMS=cpu to hit the TPU.

Usage: python tools/profile_stages.py [--batch 256] [--iters 20]
"""

from __future__ import annotations

import argparse
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
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.ops.nms import _greedy_keep, _merge_detections


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backbone", default="mobilenet_v2")
    args = p.parse_args()

    cfg = get_hyper_params(args.backbone, compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = jnp.asarray(generate_anchors(cfg))
    b, n, l = args.batch, cfg.total_anchors, cfg.total_labels
    c = l - 1
    k = min(cfg.max_detections_per_class, n)
    print(f"batch={b} anchors={n} classes={c} K={k} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (b, cfg.img_size, cfg.img_size,
                                             3)), jnp.float32)
    deltas = jnp.asarray(rng.normal(0, 0.5, (b, n, 4)), jnp.float32)
    logits = jnp.asarray(rng.normal(0, 2, (b, n, l)), jnp.float32)

    def report(name, dt):
        print(f"{name:32s} {dt * 1e3:9.3f} ms   "
              f"({b / dt:9.1f} img/s)")

    # 1. forward only
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    dt = _time_fn(fwd, (variables, images), args.iters)
    report("forward", dt)

    # 2. full predict (forward + decode + nms)
    full = jax.jit(lambda v, x: decode_predictions(
        anchors, *model.apply(v, x, train=False), cfg))
    dt = _time_fn(full, (variables, images), args.iters)
    report("forward+decode+nms", dt)

    # 3. decode+nms alone on random tensors
    post = jax.jit(lambda d, lg: decode_predictions(anchors, d, lg, cfg))
    dt = _time_fn(post, (deltas, logits), args.iters)
    report("decode+nms (random)", dt)

    # 4. decode only
    dec = jax.jit(lambda d: box_ops.clip_boxes(
        box_ops.decode(anchors, d, cfg.variances)))
    dt = _time_fn(dec, (deltas,), args.iters)
    report("decode+clip", dt)

    # 5. softmax + transpose + per-class top_k
    def topk_stage(lg):
        scores = jax.nn.softmax(lg, axis=-1)[..., 1:]
        return jax.lax.top_k(jnp.swapaxes(scores, 1, 2), k)
    tk = jax.jit(topk_stage)
    dt = _time_fn(tk, (logits,), args.iters)
    report("softmax+transpose+topk", dt)

    # 5b. approx_max_k variant
    def topk_approx(lg):
        scores = jax.nn.softmax(lg, axis=-1)[..., 1:]
        return jax.lax.approx_max_k(jnp.swapaxes(scores, 1, 2), k)
    tka = jax.jit(topk_approx)
    dt = _time_fn(tka, (logits,), args.iters)
    report("softmax+transpose+approx_max_k", dt)

    # precompute candidates for the later stages
    boxes = dec(deltas)
    top_scores, top_idx = jax.device_get(tk(logits))
    top_scores = jnp.asarray(top_scores)
    top_idx = jnp.asarray(top_idx)

    # 6. candidate box gather
    def gather(bx, ti):
        return jnp.take_along_axis(
            bx, ti.reshape(b, -1)[..., None], axis=1).reshape(b, c, k, 4)
    ga = jax.jit(gather)
    dt = _time_fn(ga, (boxes, top_idx), args.iters)
    report("candidate gather", dt)
    top_boxes = ga(boxes, top_idx)

    # 7. IoU + fixpoint suppression
    def suppress(tb, ts):
        ious = box_ops.iou_matrix(tb, tb)
        valid = ts > cfg.nms_score_threshold
        return jax.vmap(jax.vmap(
            lambda io, v: _greedy_keep(io, v, cfg.nms_iou_threshold)))(
                ious, valid)
    su = jax.jit(suppress)
    dt = _time_fn(su, (top_boxes, top_scores), args.iters)
    report("iou+fixpoint suppress", dt)
    keep = su(top_boxes, top_scores)

    # 8. merge (global top-k) — current _merge_detections signature
    # (raw scores + keep mask + flat candidate boxes)
    def merge(kp, ts, tb):
        return _merge_detections(
            ts, kp, tb.reshape(b, -1, 4), c, k, cfg.max_total_detections)
    mg = jax.jit(merge)
    dt = _time_fn(mg, (keep, top_scores, top_boxes), args.iters)
    report("merge (final topk)", dt)


if __name__ == "__main__":
    main()
