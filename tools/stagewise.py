"""Incremental postprocess-graph timing: find where the fused graph's
cost appears. Usage: python tools/stagewise.py <n_stages> [--barriers]
Runs stages 1..n fused in ONE jit from raw (deltas, logits) inputs.
"""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _time_fn
from tfssd_tpu import get_hyper_params
from tfssd_tpu.ops import boxes as box_ops
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.ops.nms import _greedy_keep_blocked, _merge_detections

B = 256
_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
nstages = int(_pos[0]) if _pos else 6  # default: the full fused graph
barriers = "--barriers" in sys.argv

cfg = get_hyper_params("mobilenet_v2")
anchors = jnp.asarray(generate_anchors(cfg))
N, L = cfg.total_anchors, cfg.total_labels
C, K = L - 1, min(cfg.max_detections_per_class, cfg.total_anchors)
rng = np.random.default_rng(0)
deltas = jnp.asarray(rng.normal(0, 0.5, (B, N, 4)), jnp.float32)
logits = jnp.asarray(rng.normal(0, 2, (B, N, L)), jnp.float32)


def bar(*xs):
    if not barriers:
        return xs if len(xs) > 1 else xs[0]
    out = jax.lax.optimization_barrier(xs)
    return out if len(xs) > 1 else out[0]


def staged(d, lg):
    boxes = box_ops.clip_boxes(box_ops.decode(anchors, d, cfg.variances))
    if nstages == 1:
        return boxes
    boxes = bar(boxes)
    scores_t = jnp.swapaxes(jax.nn.softmax(lg, -1)[..., 1:], 1, 2)
    if nstages == 2:
        return boxes, scores_t
    scores_t = bar(scores_t)
    top_scores, top_idx = jax.lax.top_k(scores_t, K)
    if nstages == 3:
        return boxes, top_scores, top_idx
    top_scores, top_idx = bar(top_scores, top_idx)
    top_boxes = jnp.take_along_axis(
        boxes, top_idx.reshape(B, -1)[..., None], axis=1
    ).reshape(B, C, K, 4)
    valid = top_scores > cfg.nms_score_threshold
    if nstages == 4:
        return top_boxes, valid
    keep = _greedy_keep_blocked(
        top_boxes.reshape(-1, K, 4), valid.reshape(-1, K),
        cfg.nms_iou_threshold).reshape(B, C, K)
    if nstages == 5:
        return keep
    keep = bar(keep)
    return _merge_detections(
        top_scores, keep, top_boxes.reshape(B, -1, 4),
        C, K, cfg.max_total_detections)


fn = jax.jit(staged)
import time
t0 = time.time()
jax.block_until_ready(fn(deltas, logits))
compile_s = time.time() - t0
dt = _time_fn(fn, (deltas, logits), 20)
print(f"stages<={nstages} barriers={barriers}: {dt*1e3:8.3f} ms  "
      f"({B/dt:9.1f} img/s)  compile {compile_s:.1f}s", flush=True)
