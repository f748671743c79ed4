"""Training entry point.

Reference parity: trainer.py — `python trainer.py --backbone
{vgg16,mobilenet_v2}` trains SSD300 on VOC (reference: tfds VOC07+12
trainval; here: a raw VOCdevkit directory via --data-root, or the
synthetic dataset when none is available), with augmentation, Adam(1e-3)
+ the step-decay scheduler, best-by-val-loss checkpointing and metric
logging (SURVEY.md §3.1).

TPU-native: one jitted train step (augment -> match -> forward -> loss ->
update) sharded over a data-parallel mesh of all visible chips; host work
is only batching uint8 images.
"""

from __future__ import annotations

import os
import time

import jax

# Honor JAX_PLATFORMS=cpu BEFORE any other import — see predictor.py:
# downstream imports can initialize the backend, after which the
# sitecustomize's axon pin is unswitchable.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import (
    ConcatDataset,
    SyntheticDataset,
    VOCDataset,
    batch_examples,
    prefetch,
    stack_batches,
    stage_arrays,
)
from tfssd_tpu.models import get_model
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.parallel import get_mesh, replicate, shard_batch
from tfssd_tpu.train import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from tfssd_tpu.utils.checkpoint import CheckpointManager
from tfssd_tpu.utils.io import (
    get_log_path,
    get_model_path,
    handle_args,
    parse_data_root,
)
from tfssd_tpu.utils.metrics import MetricsLogger
from tfssd_tpu.utils.profiling import enable_persistent_compile_cache


def make_datasets(args, img_size: int):
    if args.dataset == "voc" and not args.data_root:
        raise SystemExit(
            "--dataset voc needs at least one --data-root "
            "VOCdevkit/VOC2007-style directory (tfds is unavailable "
            "offline); pass --dataset synthetic to train without data")
    if args.dataset == "voc" and args.data_root:
        # Repeatable --data-root (ROOT[:SPLIT]) concatenates training
        # sets — the reference composes VOC07 train+validation with VOC12
        # trainval (trainer.py / data_utils.get_dataset voc/2007+voc/2012).
        parts = [
            VOCDataset(root, split, image_size=img_size)
            for root, split in (parse_data_root(s, args.train_split)
                                for s in args.data_root)
        ]
        train = parts[0] if len(parts) == 1 else ConcatDataset(parts)
        # Validation comes from the FIRST root (the reference monitors
        # val_loss on VOC07 only).
        val_root, _ = parse_data_root(args.data_root[0], args.train_split)
        val = VOCDataset(val_root, args.val_split, image_size=img_size)
    else:
        train = SyntheticDataset(args.synthetic_size, image_size=img_size,
                                 seed=0)
        val = SyntheticDataset(max(args.synthetic_size // 8, 8),
                               image_size=img_size, seed=10_000)
    return train, val


def main():
    parser = handle_args("tfssd_tpu trainer")
    parser.add_argument("--epochs", type=int, default=120)
    parser.add_argument("--steps-per-epoch", type=int, default=None,
                        help="override; default = ceil(len(train)/batch)")
    parser.add_argument("--train-split", default="trainval")
    parser.add_argument("--val-split", default="val")
    parser.add_argument("--synthetic-size", type=int, default=512)
    parser.add_argument("--no-augment", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--port-h5", default=None,
                        help="initialize the conv trunk from a Keras h5 "
                             "(reference weights / keras.applications "
                             "ImageNet trunk) and fine-tune from it; "
                             "ignored when --resume finds a checkpoint")
    parser.add_argument("--init-lr", type=float, default=1e-3)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 conv trunk (recommended on TPU)")
    parser.add_argument("--pallas", action="store_true",
                        help="use the Pallas native-tier kernels")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize backbone activations "
                             "(larger batches, ~30%% more fwd FLOPs)")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of epoch 0 "
                             "into the log dir")
    parser.add_argument("--debug-nans", action="store_true",
                        help="fail fast on NaNs (CI sanitizer)")
    parser.add_argument("--ckpt-every", type=int, default=1,
                        help="epochs between checkpoint saves (the final "
                             "epoch always saves)")
    parser.add_argument("--val-every", type=int, default=1,
                        help="epochs between validation passes (the final "
                             "epoch always validates; epochs without a "
                             "val pass also skip checkpointing, since "
                             "best-by-val-loss needs the metric)")
    parser.add_argument("--val-limit", type=int, default=None,
                        help="cap validation at N batches per pass "
                             "(default: the full val set)")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="optimizer steps fused into one device "
                             "dispatch (lax.scan over the step). "
                             "Semantics are identical to 1; >1 "
                             "amortizes per-dispatch host latency. "
                             "steps_per_epoch is floored to a multiple")
    parser.add_argument("--device-cache", choices=("auto", "on", "off"),
                        default="auto",
                        help="stage the decoded dataset in device HBM "
                             "once and gather batches on device (the "
                             "tf.data cache() analog, cached past the "
                             "H2D boundary). auto = on when the data "
                             "fits in ~6 GB. Streamed feeding over the "
                             "TPU tunnel runs 240-470 ms/step; resident "
                             "data runs the same loop at 34 ms/step")
    parser.add_argument("--prefetch-depth", type=int, default=4,
                        help="host batches buffered ahead of the device")
    parser.add_argument("--workers", type=int, default=8,
                        help="parallel host decode threads")
    parser.add_argument("--log-every", type=int, default=50,
                        help="steps between metric host syncs (each sync "
                             "is a device round trip)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    # Warm-start all jit compiles (train step ~1-4 min cold) from the
    # persistent XLA cache; second runs compile in seconds.
    enable_persistent_compile_cache()
    cfg = get_hyper_params(
        args.backbone,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        use_pallas=args.pallas,
        remat=args.remat)
    print(f"backbone={cfg.backbone} img={cfg.img_size} "
          f"anchors={cfg.total_anchors} devices={jax.device_count()}")

    train_ds, val_ds = make_datasets(args, cfg.img_size)
    if len(train_ds) < args.batch_size:
        raise SystemExit(
            f"training dataset ({len(train_ds)} examples) is smaller than "
            f"--batch-size {args.batch_size}; full batches are required "
            f"(static shapes) — lower the batch size")
    if args.batch_size % jax.device_count():
        # Fail fast with an actionable message: the data-parallel
        # sharding splits the batch axis over the mesh, and a
        # non-divisible batch would otherwise surface as an opaque
        # device_put ValueError from inside the prefetch producer
        # thread (r5 review).
        raise SystemExit(
            f"--batch-size {args.batch_size} must be a multiple of the "
            f"{jax.device_count()} visible devices (the batch axis is "
            f"sharded over the data-parallel mesh)")
    # The device-cache decision must precede steps_per_epoch: the cached
    # path wraps its index permutation so an explicit --steps-per-epoch
    # may exceed one dataset pass, but the streamed path iterates the
    # dataset once per epoch — there a too-large override must be
    # CLAMPED, or epochs silently truncate while the e2e throughput and
    # resume-epoch math still assume the full count.
    est_bytes = (len(train_ds) + len(val_ds)) * cfg.img_size ** 2 * 3
    device_cache = (args.device_cache == "on" or
                    (args.device_cache == "auto" and est_bytes <= 6e9))
    if args.device_cache == "auto" and not device_cache:
        print(f"device cache off: dataset ~{est_bytes/1e9:.1f} GB "
              f"exceeds the 6 GB auto threshold (--device-cache on to "
              f"force)")
    # floor, matching the loader's drop_remainder: ceil would overcount
    # steps, drifting resume-epoch math and the LR boundary epochs.
    one_pass_steps = max(len(train_ds) // args.batch_size, 1)
    steps_per_epoch = args.steps_per_epoch or one_pass_steps
    if not device_cache and steps_per_epoch > one_pass_steps:
        print(f"steps_per_epoch clamped to {one_pass_steps} (one dataset "
              f"pass; the streamed path cannot wrap — use --device-cache "
              f"on for longer epochs)")
        steps_per_epoch = one_pass_steps
    spc = max(1, min(args.steps_per_call, steps_per_epoch))
    if steps_per_epoch % spc:
        steps_per_epoch -= steps_per_epoch % spc
        print(f"steps_per_epoch floored to {steps_per_epoch} "
              f"(multiple of --steps-per-call {spc})")

    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    schedule = make_lr_schedule(steps_per_epoch, args.init_lr)
    optimizer = make_optimizer(schedule)
    state = create_train_state(model, jax.random.key(args.seed), optimizer)
    if args.port_h5:
        from tfssd_tpu.utils.port_weights import port_h5_into_variables

        ported = port_h5_into_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg.backbone, args.port_h5)
        state = state.replace(params=ported["params"],
                              batch_stats=ported["batch_stats"])
        print(f"ported trunk weights from {args.port_h5}; fine-tuning")

    mesh = get_mesh()
    state = replicate(mesh, state)
    # donate_argnums: the previous TrainState's buffers are consumed by
    # the update, so XLA reuses them for the new state in place — no
    # params+opt_state double-buffering in HBM. (Checkpointing is safe:
    # save_from_device dispatches an on-device copy before the next
    # step's donation can touch the buffers.)
    if device_cache:
        from tfssd_tpu.train import (
            make_cached_multi_eval_step,
            make_cached_multi_train_step,
            make_cached_train_step,
        )

        factory = (make_cached_multi_train_step if spc > 1
                   else make_cached_train_step)
        train_step = jax.jit(
            factory(model, anchors, optimizer,
                    augment=not args.no_augment),
            donate_argnums=(0,))
        eval_step = jax.jit(make_cached_multi_eval_step(model, anchors))
        train_sharding = None
    elif spc > 1:
        from tfssd_tpu.parallel import superbatch_sharding
        from tfssd_tpu.train import make_multi_train_step

        train_step = jax.jit(
            make_multi_train_step(model, anchors, optimizer,
                                  augment=not args.no_augment),
            donate_argnums=(0,))
        eval_step = jax.jit(make_eval_step(model, anchors))
        train_sharding = superbatch_sharding(mesh)
    else:
        train_step = jax.jit(
            make_train_step(model, anchors, optimizer,
                            augment=not args.no_augment),
            donate_argnums=(0,))
        eval_step = jax.jit(make_eval_step(model, anchors))
        train_sharding = None

    model_path = get_model_path(args.backbone, args.model_dir)
    ckpt = CheckpointManager(model_path)
    # Schedule-geometry sidecar: the resume epoch (step // steps_per_epoch)
    # and the LR decay boundaries are derived from the CURRENT flags, so
    # resuming with a different batch size / dataset size / steps-per-call
    # silently shifts both (r5 review). Persist the geometry and warn
    # loudly on mismatch.
    import json as _json

    meta = {"steps_per_epoch": steps_per_epoch,
            "batch_size": args.batch_size, "steps_per_call": spc}
    # sidecar lives NEXT TO the orbax root, not inside it (orbax scans
    # the root for step directories)
    meta_path = os.path.normpath(model_path) + "_meta.json"
    if args.resume and ckpt.latest_step() is not None:
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                old_meta = _json.load(f)
            if old_meta != meta:
                print(f"WARNING: resuming with changed schedule geometry "
                      f"(checkpoint: {old_meta}, this run: {meta}) — the "
                      f"resume epoch and LR decay boundaries will NOT "
                      f"line up with the original run")
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    os.makedirs(os.path.dirname(meta_path) or ".", exist_ok=True)
    with open(meta_path, "w") as f:
        _json.dump(meta, f)

    log_path = get_log_path(args.backbone, args.log_dir)
    log = MetricsLogger(log_path)
    if args.debug_nans:
        from tfssd_tpu.utils.profiling import enable_debug_nans
        enable_debug_nans()
    rng = jax.random.key(args.seed + 1)
    total_images = 0
    train_start = None

    def to_device(batches, sharding=None):
        # Runs inside the prefetch producer thread: jax.device_put there
        # (not in the step loop) so H2D transfers overlap whatever the
        # runtime allows. (The real fix for the put/dispatch interleave
        # penalty is --steps-per-call; this keeps host batching off the
        # critical path either way.)
        for b in batches:
            yield (shard_batch(mesh, {
                "image": b["image"],
                "boxes": b["boxes"],
                "labels": b["labels"],
            }, sharding=sharding), b["num_valid"])

    train_data = val_data = None
    train_n = val_n = 0
    if device_cache:
        # Stage the decoded datasets in HBM once (one transfer per key);
        # epochs then ship only 4·B-byte index rows per step. Raw pixels
        # are cached — augmentation still runs per step inside the jit.
        from tfssd_tpu.train import flatten_images

        t0 = time.perf_counter()
        # Pad the staged row count to the device count: the data-axis
        # sharding requires divisibility, and epoch gather indices only
        # ever address rows < train_n, so the all-background padding
        # rows are never touched (r5 review: an undivisible N crashed
        # staging on any multi-chip mesh). Val is padded to batch_size,
        # which the upfront guard makes device-divisible too.
        host_train, train_n = stage_arrays(
            train_ds, cfg.max_gt_boxes, workers=args.workers,
            pad_to_multiple=jax.device_count())
        # Images ship FLAT (N, S*S*3): a 4-D u8 gather operand makes XLA
        # relayout the whole resident dataset inside the step (~2 extra
        # dataset-sized copies -> compile OOM at VOC scale).
        train_data = shard_batch(mesh, flatten_images({
            k: host_train[k] for k in ("image", "boxes", "labels")}))
        host_val, val_n = stage_arrays(
            val_ds, cfg.max_gt_boxes, workers=args.workers,
            pad_to_multiple=args.batch_size)
        val_data = shard_batch(mesh, flatten_images({
            k: host_val[k] for k in ("image", "boxes", "labels")}))
        jax.block_until_ready(
            (train_data["image"], val_data["image"]))
        del host_train, host_val
        gb = (train_n + val_n) * cfg.img_size ** 2 * 3 / 1e9
        print(f"device cache: staged {train_n}+{val_n} images "
              f"(~{gb:.2f} GB) in {time.perf_counter()-t0:.1f}s")

    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        if device_cache:
            # An explicit --steps-per-epoch may exceed one pass over the
            # dataset; concatenate fresh permutations until the epoch's
            # index budget is covered. (The streamed path cannot wrap —
            # it gets clamped to one pass at startup instead.)
            need = steps_per_epoch * args.batch_size
            rng_ep = np.random.default_rng(args.seed * 10_000 + epoch)
            idx_epoch = np.concatenate(
                [rng_ep.permutation(train_n)
                 for _ in range(-(-need // train_n))])[:need].astype(
                     np.int32)
            it = None
        else:
            batches = batch_examples(
                train_ds, args.batch_size, cfg.max_gt_boxes,
                shuffle_seed=args.seed * 10_000 + epoch,
                workers=args.workers)
            if spc > 1:
                batches = stack_batches(batches, spc)
            it = prefetch(to_device(batches, sharding=train_sharding),
                          depth=args.prefetch_depth)
        epoch_metrics = []
        profiling = args.profile and epoch == start_epoch
        if profiling:
            from tfssd_tpu.utils import profiling as prof
            trace_cm = prof.trace(log_path)
            trace_cm.__enter__()
        epoch_steps = 0
        try:
            for chunk_idx in range(steps_per_epoch // spc):
                step_in_epoch = chunk_idx * spc
                if device_cache:
                    rows = idx_epoch[step_in_epoch * args.batch_size:
                                     (step_in_epoch + spc) * args.batch_size]
                    rows = rows.reshape(spc, args.batch_size)
                    idx_dev = jax.numpy.asarray(
                        rows if spc > 1 else rows[0])
                    state, metrics = train_step(state, train_data, idx_dev,
                                                rng)
                else:
                    try:
                        device_batch, _ = next(it)
                    except StopIteration:
                        # can't happen after the one-pass clamp unless the
                        # dataset shrank mid-run; count only real steps
                        break
                    state, metrics = train_step(state, device_batch, rng)
                epoch_steps += spc
                # Steps dispatch asynchronously; only sync metrics to host at
                # the logging cadence (each float() is a device round trip).
                # Multi-step dispatches return metrics stacked (spc,); log
                # the last step of the chunk that crosses the cadence.
                if step_in_epoch % args.log_every < spc:
                    m = {k: float(v[-1] if spc > 1 else v)
                         for k, v in metrics.items()}
                    epoch_metrics.append(m)
                    print(f"epoch {epoch} step {step_in_epoch}/{steps_per_epoch} "
                          f"loss={m['loss']:.4f} loc={m['loc_loss']:.4f} "
                          f"conf={m['conf_loss']:.4f}")
                    log.log(int(jax.device_get(state.step)), m, prefix="train/")
            jax.block_until_ready(state.params)
        finally:
            # stop the trace even when the epoch aborts (NaN debug
            # halt, Ctrl-C, OOM): the failing run is exactly when
            # the requested trace matters (r5 review)
            if profiling:
                trace_cm.__exit__(None, None, None)
                print(f"profiler trace written to {log_path}")
        if train_start is not None:
            total_images += epoch_steps * args.batch_size

        # validation (every --val-every epochs; the final epoch always).
        # Partial batches are kept (a val set smaller than the batch must
        # still yield a loss) and the mean is weighted by the number of
        # REAL images per batch: padded rows contribute exactly zero
        # loss, so an unweighted mean would dilute the final partial
        # batch and bias best-checkpoint selection.
        last_epoch = epoch == args.epochs - 1
        if (epoch + 1) % args.val_every == 0 or last_epoch:
            # Dispatch EVERY eval step before syncing any loss to host:
            # each float() is a device round trip, and syncing per batch
            # serialized transfer behind compute.
            val_losses, val_count = [], 0
            if device_cache:
                # ONE dispatch for the whole pass (chunked lax.map over the K
                # val batches): per-dispatch host latency was ~200 ms
                # over the tunnel, ~1 s/epoch at K=5.
                n_batches = val_data["image"].shape[0] // args.batch_size
                if args.val_limit is not None:
                    n_batches = min(n_batches, args.val_limit)
                idx = jax.numpy.arange(
                    n_batches * args.batch_size,
                    dtype=jax.numpy.int32).reshape(n_batches,
                                                   args.batch_size)
                val_losses = list(eval_step(state, val_data,
                                            idx)["loss"])
                val_count = sum(
                    max(0, min(val_n - vb * args.batch_size,
                               args.batch_size))
                    for vb in range(n_batches))
            else:
                for vb, (device_batch, num_valid) in enumerate(prefetch(
                        to_device(batch_examples(
                            val_ds, args.batch_size, cfg.max_gt_boxes,
                            drop_remainder=False,
                            workers=args.workers)),
                        depth=args.prefetch_depth)):
                    if args.val_limit is not None and vb >= args.val_limit:
                        break
                    val_losses.append(
                        eval_step(state, device_batch)["loss"])
                    val_count += num_valid
            # real-row sum: padded rows contribute zero loss
            val_total = sum(
                float(x) * args.batch_size
                for x in jax.device_get(val_losses))
            val_loss = val_total / val_count if val_count else float("inf")
            tr = float(np.mean([m["loss"] for m in epoch_metrics])) \
                if epoch_metrics else float("nan")
            print(f"epoch {epoch}: train_loss={tr:.4f} "
                  f"val_loss={val_loss:.4f} "
                  f"lr={float(schedule(int(state.step))):.2e}")
            log.log(int(state.step), {"val_loss": val_loss, "epoch": epoch})
            if (epoch + 1) % args.ckpt_every == 0 or last_epoch:
                # Fully async: on-device copy + pipelined D2H + orbax in
                # a background thread. The synchronous device_get here
                # was measured at ~20 s/epoch over the TPU tunnel — the
                # single largest end-to-end train overhead.
                ckpt.save_from_device(int(state.step), state,
                                      val_loss=val_loss)
        # End-to-end clock starts after the FIRST full epoch iteration
        # (train + val + ckpt), so the one-time jit compiles of the train
        # AND eval steps are excluded and every timed epoch carries the
        # full loop overhead (data loading, val passes, async saves).
        if train_start is None:
            train_start = time.perf_counter()

    if train_start is not None and total_images:
        elapsed = time.perf_counter() - train_start
        e2e = total_images / elapsed
        short = {"mobilenet_v2": "mbv2", "vgg16": "vgg16",
                 "vgg16_512": "ssd512"}.get(args.backbone, args.backbone)
        import json as _json
        print(_json.dumps({
            "metric": f"train_{short}_e2e_images_per_sec",
            "value": round(e2e, 2), "unit": "images/sec",
            "config": f"trainer.py end-to-end, batch {args.batch_size}, "
                      f"val-every {args.val_every}, "
                      f"{'device-cached data' if device_cache else 'streamed data'}"
                      + (f", steps-per-call {spc}" if spc > 1 else "")
                      + f", incl. validation + checkpointing (post-compile; "
                      f"data staging/decoding in epoch 0)"}))
    ckpt.close()
    log.close()


if __name__ == "__main__":
    main()
