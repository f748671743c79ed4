"""Training semantics: train state, jitted train/eval steps, LR schedule.

Reference parity: trainer.py + utils/train_utils.py — Adam(1e-3) with the
step-decay `scheduler(epoch)` (1e-3 -> 1e-4 -> 1e-5), per-backbone
hyperparams, GT matching + target encoding per batch, loss =
loc + conf (ssd_loss.CustomLoss), `get_step_size` = ceil(total/batch).

TPU-first restructure (SURVEY.md §7): the reference's hot loop runs GT
matching in a Python generator on the host, outside the compiled step.
Here ONE jitted, mesh-sharded function does everything after the raw
uint8 batch lands on device: normalize -> (optional) batched augmentation
-> anchor matching/encoding -> forward (bf16 trunk) -> loss -> grads ->
Adam update. Gradients all-reduce over the "data" mesh axis automatically
(XLA inserts the psum because params are replicated and the batch is
sharded).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tfssd_tpu.config import SSDConfig
from tfssd_tpu.data.augment import augment_batch
from tfssd_tpu.models.ssd import SSD
from tfssd_tpu.ops.losses import ssd_losses
from tfssd_tpu.ops.matching import match_batch as _match_batch_jnp


def _matcher(cfg: SSDConfig):
    """Select the GT matcher: Pallas fused kernel (config.use_pallas) or
    the jnp reference (ops.matching.match_batch). Both implement the
    full semantics including the optional paper force-match step
    (config.force_match_for_gt) — the kernel path applies it as a jnp
    post-pass that derives each gt's best anchor from the same
    iou_matrix expression the jnp matcher uses (exact tie-break parity;
    see ops/kernels/match_encode.py)."""
    if cfg.use_pallas:
        from tfssd_tpu.ops.kernels.match_encode import match_batch_pallas
        return match_batch_pallas
    return _match_batch_jnp

Array = jnp.ndarray


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def scheduler(epoch: int, init_lr: float = 1e-3,
              boundaries: Tuple[int, int] = (80, 110)) -> float:
    """Mirror of reference train_utils.scheduler(epoch): step decay
    1e-3 -> 1e-4 -> 1e-5 at the epoch boundaries."""
    if epoch < boundaries[0]:
        return init_lr
    if epoch < boundaries[1]:
        return init_lr * 0.1
    return init_lr * 0.01


def get_step_size(total_items: int, batch_size: int) -> int:
    """Mirror of reference train_utils.get_step_size (ceil division)."""
    return math.ceil(total_items / batch_size)


def make_lr_schedule(steps_per_epoch: int, init_lr: float = 1e-3,
                     boundaries: Tuple[int, int] = (80, 110)
                     ) -> optax.Schedule:
    """The reference's per-epoch step decay as a per-step optax schedule."""
    return optax.piecewise_constant_schedule(
        init_lr,
        {boundaries[0] * steps_per_epoch: 0.1,
         boundaries[1] * steps_per_epoch: 0.1},
    )


def make_optimizer(learning_rate) -> optax.GradientTransformation:
    """Adam, as the reference compiles with (trainer.py: Adam(1e-3))."""
    return optax.adam(learning_rate)


def create_train_state(model: SSD, rng: jax.Array,
                       optimizer: optax.GradientTransformation,
                       batch_size: int = 1) -> TrainState:
    # Shares models.ssd's module-level jitted init so a second init of
    # the same config hits the jit cache instead of recompiling.
    from tfssd_tpu.models.ssd import init_model

    variables = init_model(model, rng, batch_size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def preprocess_images(images: Array) -> Array:
    """uint8 [0,255] or float [0,1] -> [-1, 1] (reference
    data_utils.preprocessing pixel scaling)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    return images * 2.0 - 1.0


def make_train_step(model: SSD, anchors: Array,
                    optimizer: optax.GradientTransformation,
                    augment: bool = True):
    """Build the fused train step: (state, batch, rng) -> (state, metrics).

    `batch` = {'image' (B,S,S,3) uint8, 'boxes' (B,G,4), 'labels' (B,G)}.
    Jit this (optionally with shardings from tfssd_tpu.parallel).
    """
    cfg = model.config
    anchors = jnp.asarray(anchors)

    match_batch = _matcher(cfg)

    def loss_fn(params, batch_stats, images, gt_boxes, gt_labels):
        actual_deltas, actual_labels = match_batch(
            anchors, gt_boxes, gt_labels, cfg)
        (pred_deltas, pred_logits), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"])
        total, metrics = ssd_losses(
            actual_deltas, actual_labels, pred_deltas, pred_logits,
            cfg.neg_pos_ratio, cfg.loc_loss_alpha)
        return total, (metrics, updates["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, Array]]:
        images = batch["image"]
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        gt_boxes, gt_labels = batch["boxes"], batch["labels"]
        if augment:
            step_rng = jax.random.fold_in(rng, state.step)
            images, gt_boxes, gt_labels = augment_batch(
                step_rng, images, gt_boxes, gt_labels)
        images = images * 2.0 - 1.0

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, gt_boxes, gt_labels)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_multi_train_step(model: SSD, anchors: Array,
                          optimizer: optax.GradientTransformation,
                          augment: bool = True):
    """K sequential optimizer steps per dispatch via lax.scan.

    Takes a SUPER-batch {'image' (K,B,S,S,3), 'boxes' (K,B,G,4),
    'labels' (K,B,G)} and applies the single-step semantics K times —
    bit-for-bit the same math as K separate `make_train_step` calls
    (state.step advances per slice, so the LR schedule and the
    per-step augmentation rng `fold_in(rng, step)` are identical).

    Why it exists: dispatching one step per host call leaves the device
    idle for the host round-trip between every step. Measured on the TPU
    serving tunnel: back-to-back dispatches over pre-staged batches run
    34 ms/step, but the same loop with an H2D put interleaved between
    dispatches collapses to ~240 ms/step. One scan dispatch per K steps
    amortizes that put/dispatch cycle K-fold; metrics come back stacked
    (K,) per entry.

    Multi-chip: shard the super-batch with
    `parallel.superbatch_sharding` — scan axis whole, batch axis split
    over "data" — and every scan iteration runs the normal data-parallel
    step (gradient psum inserted by XLA).
    """
    base = make_train_step(model, anchors, optimizer, augment=augment)

    def multi_step(state: TrainState, superbatch: Dict[str, Array],
                   rng: jax.Array):
        def body(st, batch_k):
            return base(st, batch_k, rng)

        return jax.lax.scan(body, state, superbatch)

    return multi_step


def gather_rows(data: Dict[str, Array], idx: Array) -> Dict[str, Array]:
    """Gather one batch from the device-resident dataset (public: the
    predictor's cached-eval path reuses it for image-only dicts).

    `data['image']` may be FLAT (N, S*S*3) — the layout-proof staging
    shape — or (N, S, S, 3). Flat is what trainer.py ships: with a 4-D
    u8 operand XLA picks a gather-internal layout different from the
    parameter's and RELAYOUTS THE WHOLE DATASET inside the step (two
    extra ~5 GB copies at VOC scale = compile-time OOM, observed r4:
    18.67 G requested of 15.75 G). A 2-D operand has only trivial
    layouts, so the gather reads the resident buffer in place and any
    layout churn happens on the gathered (B, S*S*3) batch instead."""
    out = {k: jnp.take(data[k], idx, axis=0)
           for k in ("image", "boxes", "labels") if k in data}
    img = out["image"]
    if img.ndim == 2:
        side = int(round((img.shape[1] // 3) ** 0.5))
        out["image"] = img.reshape(idx.shape[0], side, side, 3)
    return out


def flatten_images(data: Dict[str, Array]) -> Dict[str, Array]:
    """Stage-side counterpart of gather_rows' flat-image support:
    reshape (N, S, S, 3) images to (N, S*S*3) rows before shipping the
    resident dataset to HBM (see gather_rows for why)."""
    out = dict(data)
    img = out["image"]
    if img.ndim == 4:
        out["image"] = img.reshape(img.shape[0], -1)
    return out


def make_cached_train_step(model: SSD, anchors: Array,
                           optimizer: optax.GradientTransformation,
                           augment: bool = True):
    """Train step fed from a DEVICE-RESIDENT dataset: (state, data, idx,
    rng) -> (state, metrics).

    `data` = {'image' (N,S,S,3) uint8, 'boxes' (N,G,4), 'labels' (N,G)}
    staged in HBM once; `idx` (B,) int32 selects this step's rows and the
    batch is gathered ON DEVICE. The host then ships 4·B bytes per step
    instead of ~270 KB per image — the TPU-native analog of the
    reference's `tf.data.Dataset.cache()` (data_utils.get_dataset), but
    cached past the H2D boundary. Measured motivation: the serving
    tunnel's H2D bandwidth is 50-450 MB/s and cannot overlap dispatches
    (streamed loop: 240-470 ms/step), while the same loop over resident
    data runs 34 ms/step. Raw pixels are cached, not augmented ones:
    augmentation runs inside the step, so every epoch still draws fresh
    random crops/flips/photometrics.

    Epoch shuffling is the caller's global permutation of [0, N) — a
    TRUE uniform shuffle (the reference's shuffle(8000) over ~16.5k
    examples is only approximate).
    """
    base = make_train_step(model, anchors, optimizer, augment=augment)

    def cached_step(state: TrainState, data: Dict[str, Array],
                    idx: Array, rng: jax.Array):
        return base(state, gather_rows(data, idx), rng)

    return cached_step


def make_cached_multi_train_step(model: SSD, anchors: Array,
                                 optimizer: optax.GradientTransformation,
                                 augment: bool = True):
    """K steps per dispatch over device-resident data: idx is (K, B);
    each scan iteration gathers its own batch on device. Combines the
    dispatch amortization of make_multi_train_step with the resident-data
    feed of make_cached_train_step."""
    base = make_train_step(model, anchors, optimizer, augment=augment)

    def multi_step(state: TrainState, data: Dict[str, Array],
                   idx: Array, rng: jax.Array):
        def body(st, idx_k):
            return base(st, gather_rows(data, idx_k), rng)

        return jax.lax.scan(body, state, idx)

    return multi_step


def make_cached_eval_step(model: SSD, anchors: Array):
    """Eval step over device-resident validation data: (state, data,
    idx) -> metrics, gathering the batch on device like
    make_cached_train_step."""
    base = make_eval_step(model, anchors)

    def cached_eval(state: TrainState, data: Dict[str, Array],
                    idx: Array):
        return base(state, gather_rows(data, idx))

    return cached_eval


def make_cached_multi_eval_step(model: SSD, anchors: Array,
                                chunk: int = 4):
    """The WHOLE validation pass as one dispatch: idx is (K, B) — all K
    val batches evaluated in a single dispatch over the device-resident
    data, metrics returned stacked (K,) per entry.

    Why one dispatch: each eval dispatch over the TPU serving tunnel pays
    a host round-trip cycle (~200 ms measured inside the train loop); a
    5-batch validation pass as 5 dispatches cost ~1.0 s/epoch of the
    end-to-end budget, as one dispatch ~0.3 s.

    Why chunked (lax.map with batch_size=chunk) and not one flat vmap:
    a flat vmap over K batches peaks activation memory at K×batch — with
    a real VOC val split (~2.5k images) alongside a resident dataset
    that is an OOM on a 16 GB chip. lax.map scans groups of `chunk`
    vmapped batches, so peak memory is chunk×batch regardless of val-set
    size while still being a single dispatch. A K that doesn't divide
    `chunk` is handled by lax.map's native remainder program (one extra
    compile the first time that K shows up) rather than by padding —
    padding would evaluate up to chunk-1 redundant batches EVERY pass.
    Metrics return stacked (K,) per entry.
    """
    base = make_eval_step(model, anchors)

    def multi_eval(state: TrainState, data: Dict[str, Array],
                   idx: Array):
        return jax.lax.map(
            lambda idx_k: base(state, gather_rows(data, idx_k)), idx,
            batch_size=chunk)

    return multi_eval


def make_eval_step(model: SSD, anchors: Array):
    """Validation loss step (no augmentation, running BN stats)."""
    cfg = model.config
    anchors = jnp.asarray(anchors)

    match_batch = _matcher(cfg)

    def eval_step(state: TrainState, batch: Dict[str, Array]
                  ) -> Dict[str, Array]:
        images = preprocess_images(batch["image"])
        actual_deltas, actual_labels = match_batch(
            anchors, batch["boxes"], batch["labels"], cfg)
        pred_deltas, pred_logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        _, metrics = ssd_losses(
            actual_deltas, actual_labels, pred_deltas, pred_logits,
            cfg.neg_pos_ratio, cfg.loc_loss_alpha)
        return metrics

    return eval_step
