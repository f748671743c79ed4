"""Fused per-class NMS suppression Pallas kernel.

Reference parity: the suppression core of
`tf.image.combined_non_max_suppression` (reference
bbox_utils.non_max_suppression) — identical keep decisions to
ops.nms._greedy_keep (exact greedy), which remains the jnp reference.

Why a kernel here: the XLA fixpoint path materializes the (B*C, K, K)
suppression matrix in HBM and re-reads it every sweep — the whole stage
is HBM-bound. This kernel gives each (image, class) instance a program
whose IoU matrix and suppression state never leave VMEM: per program it
reads K boxes (3 KB), builds the K x K IoU in registers/VMEM, runs the
same fixpoint to convergence locally, and writes K keep bytes. Traffic
drops from ~250 MB x sweeps to ~20 MB total; the stage becomes
VPU-compute-bound.

The fixpoint (not the K-step serial greedy) is still the right loop
INSIDE the kernel: grid programs serialize on the single tensor core, so
per-program work must be minimal — O(chain_depth) sweeps of a K-wide
vector op beats K serial steps. See ARCHITECTURE.md "NMS".

MEASURED OUTCOME (v5e, batch 256, SSD300-MBv2 full predict): this kernel
is ~13% SLOWER end-to-end than the XLA fixpoint path (47.7 vs 42.1 ms)
— per-program sweeps serialize across the 640 grid programs, while the
XLA formulation advances ALL 5120 instances in each global sweep and
converges in ~9 sweeps total. The decode path therefore defaults to a
batched XLA formulation — `config.nms_impl="blocked"`, the triangular
solve that also beat the fixpoint on heavy-overlap inputs (see
ops/nms.py); this kernel is kept as the fused-VMEM reference
(combined_nms(impl="pallas")) and as the starting point for a future
multi-instance-per-sweep variant.

Precision note: both this kernel and the XLA path compute IoU in f32 —
a bf16-candidate variant of the XLA path was tried (~2 ms faster at
batch 256) and reverted because bf16's ~0.004 absolute resolution near
coordinate 1.0 corrupts IoU for small boxes (see ops/nms.py). Keep
decisions are therefore exact greedy and identical across impls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

GROUP = 8  # (image, class) instances per program — amortizes DMA/dispatch


def _kernel(boxes_ref, scores_ref, keep_ref, *, iou_threshold: float,
            score_threshold: float, k: int):
    b = boxes_ref[:]              # (G, K, 4) f32
    s = scores_ref[:, 0, :]       # (G, K) f32
    valid = s > score_threshold

    y0, x0 = b[:, :, 0], b[:, :, 1]
    y1, x1 = b[:, :, 2], b[:, :, 3]
    iy0 = jnp.maximum(y0[:, :, None], y0[:, None, :])
    ix0 = jnp.maximum(x0[:, :, None], x0[:, None, :])
    iy1 = jnp.minimum(y1[:, :, None], y1[:, None, :])
    ix1 = jnp.minimum(x1[:, :, None], x1[:, None, :])
    inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
    area = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
    union = area[:, :, None] + area[:, None, :] - inter
    iou = inter / jnp.maximum(union, 1e-8)

    idx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    jdx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    suppress = jnp.where((iou > iou_threshold) & (idx < jdx)[None], 1.0, 0.0)

    # Loop state carries the keep mask as f32 0/1 — Mosaic while-loops
    # can't carry i1 vectors, and f32 feeds the suppress multiply anyway.
    validf = jnp.where(valid, 1.0, 0.0)

    def cond(st):
        keep, prev, it = st
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(st):
        keep, _, it = st
        # hit[g, j] = sum_i keep[g, i] * S[g, i, j] — VPU reduce, all VMEM.
        hit = jnp.sum(suppress * keep[:, :, None], axis=1)
        return (jnp.where(hit < 0.5, validf, 0.0), keep, it + 1)

    keep, _, _ = jax.lax.while_loop(
        cond, body,
        (validf, jnp.zeros_like(validf), jnp.zeros((), jnp.int32)))
    keep_ref[:, 0, :] = keep.astype(jnp.int8)


def nms_keep_pallas(
    boxes: Array,       # (R, K, 4) score-sorted candidates per instance
    scores: Array,      # (R, K)
    iou_threshold: float,
    score_threshold: float,
    interpret: bool | None = None,
) -> Array:
    """Exact-greedy keep mask (R, K) bool; R = batch*classes instances.

    interpret=None auto-selects compiled-on-TPU / interpreter elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    r, k, _ = boxes.shape
    k_pad = -(-k // 128) * 128  # lane-align the candidate axis
    r_pad = -(-r // GROUP) * GROUP
    if k_pad != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad - k), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, k_pad - k)),
                         constant_values=-jnp.inf)
    if r_pad != r:
        boxes = jnp.pad(boxes, ((0, r_pad - r), (0, 0), (0, 0)))
        scores = jnp.pad(scores, ((0, r_pad - r), (0, 0)),
                         constant_values=-jnp.inf)

    kernel = functools.partial(
        _kernel, iou_threshold=iou_threshold,
        score_threshold=score_threshold, k=k_pad)
    keep = pl.pallas_call(
        kernel,
        grid=(r_pad // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, k_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1, k_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, 1, k_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1, k_pad), jnp.int8),
        interpret=interpret,
    )(boxes, scores[:, None, :])
    return keep[:r, 0, :k].astype(bool)
