"""Inference / evaluation entry point.

Reference parity: predictor.py — loads the trained weights for a
backbone, runs the decoder model over the test split (or a folder of
custom images via --image-dir, mirroring data_utils.get_custom_imgs),
draws predictions, and computes VOC mAP@0.5 (utils/eval_utils.py).

TPU-native: forward + decode + NMS are ONE jitted function
(models.decoder.make_predict_fn); batches stream through it while mAP
accumulation happens on host numpy.
"""

from __future__ import annotations

import argparse
import os

import jax

# Honor JAX_PLATFORMS=cpu BEFORE any other import: the image's
# sitecustomize pins the axon TPU plugin through jax.config, and
# downstream imports (flax/orbax) can initialize the backend at import
# time — after which the platform is fixed and `JAX_PLATFORMS=cpu
# python predictor.py` silently runs on the TPU (observed r4: a "CPU"
# export retry-looped on a wedged TPU tunnel instead).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import (
    SyntheticDataset,
    VOCDataset,
    batch_examples,
    custom_image_generator,
    get_custom_imgs,
    get_labels,
    prefetch,
)
from tfssd_tpu.evaluate import detections_from_nms_result, evaluate_predictions
from tfssd_tpu.models import get_model, init_model, make_predict_fn
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.parallel import get_mesh, replicate, shard_batch
from tfssd_tpu.train import TrainState, preprocess_images
from tfssd_tpu.utils.checkpoint import CheckpointManager
from tfssd_tpu.utils.drawing import draw_predictions
from tfssd_tpu.utils.io import get_model_path, handle_args
from tfssd_tpu.utils.metrics import StepTimer


def _accumulate_batch(res, nv, rows, gts, dets, drawn, args, labels):
    """Shared gt/detection accumulation + optional drawing for one
    predicted batch — one implementation for the device-cached and
    streamed paths (they had drifted: --limit truncation differed
    between near-verbatim copies, r5 review). `rows` holds per-row
    arrays image/boxes/labels/difficult/ids aligned with the first `nv`
    result rows. Returns the updated drawn count."""
    dets.extend(detections_from_nms_result(res, num_valid=nv))
    for i in range(nv):
        gts.append({
            "boxes": rows["boxes"][i],
            "labels": rows["labels"][i],
            "difficult": rows["difficult"][i],
        })
        if drawn < args.draw:
            draw_predictions(
                rows["image"][i],
                np.asarray(res.boxes[i]), np.asarray(res.scores[i]),
                np.asarray(res.classes[i]), labels,
                score_threshold=args.score_threshold,
                path=os.path.join(
                    args.output_dir,
                    os.path.splitext(rows["ids"][i])[0] + ".png"))
            drawn += 1
    return drawn


def main():
    parser = handle_args("tfssd_tpu predictor")
    parser.add_argument("--split", default="test")
    parser.add_argument("--image-dir", default=None,
                        help="folder of arbitrary images instead of a split")
    parser.add_argument("--output-dir", default="outputs")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--no-eval", action="store_true")
    parser.add_argument("--draw", type=int, default=0,
                        help="save the first N images with drawn boxes")
    parser.add_argument("--score-threshold", type=float, default=0.5)
    parser.add_argument("--workers", type=int, default=8,
                        help="parallel host decode threads")
    parser.add_argument("--random-weights", action="store_true",
                        help="skip checkpoint loading (smoke testing)")
    parser.add_argument("--export", default=None, metavar="PATH",
                        help="serialize the full predict path (forward + "
                             "decode + NMS, loaded weights baked in) as "
                             "a versioned StableHLO artifact via "
                             "jax.export, then exit. Serves on CPU or "
                             "TPU with zero framework code "
                             "(utils/export.py:load_exported)")
    parser.add_argument("--export-batch", type=int, default=None,
                        help="batch size baked into --export "
                             "(default: --batch-size)")
    parser.add_argument("--device-cache", choices=("auto", "on", "off"),
                        default="auto",
                        help="stage the eval split in device HBM once "
                             "and gather batches on device (same design "
                             "as trainer.py --device-cache); streamed "
                             "feeding over the TPU tunnel is H2D-bound")
    parser.add_argument("--fold-bn", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="fold inference-mode BatchNorm into conv "
                             "weights at load time (exact per-channel "
                             "affine; BN backbones only; default on)")
    parser.add_argument("--port-h5", default=None,
                        help="Keras h5/.keras model whose trunk weights "
                             "are ported into the backbone (reference "
                             "migration path); heads stay initialized "
                             "unless a checkpoint is also loaded")
    args = parser.parse_args()
    # Warm-start jit compiles from the persistent XLA cache.
    from tfssd_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    cfg = get_hyper_params(args.backbone)
    # Fail fast on a missing checkpoint BEFORE paying the model build/compile.
    ckpt, step = None, None
    if not args.random_weights:
        ckpt = CheckpointManager(get_model_path(args.backbone, args.model_dir))
        step = ckpt.best_step()
        if step is None:  # explicit None check: step 0 is a valid best
            step = ckpt.latest_step()
        if step is None:
            ckpt.close()
            ckpt = None
            # --port-h5 can run without a checkpoint (trunk-only weights);
            # otherwise a missing checkpoint is fatal, BEFORE model build.
            if not args.port_h5:
                raise SystemExit(
                    f"no checkpoint for {args.backbone} under "
                    f"{args.model_dir}; train first or pass "
                    f"--random-weights")
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    # Weights-only template: inference never needs optimizer moments
    # (create_train_state would allocate 2x param memory for Adam state).
    init_vars = init_model(model, jax.random.key(0))
    state = TrainState(step=0, params=init_vars["params"],
                       batch_stats=init_vars.get("batch_stats", {}),
                       opt_state=None)
    if ckpt is not None:
        state = ckpt.restore_weights(state, step)
        print(f"loaded checkpoint step {step}")
        ckpt.close()

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.port_h5:
        from tfssd_tpu.utils.port_weights import port_h5_into_variables

        variables = port_h5_into_variables(
            variables, cfg.backbone, args.port_h5)
        print(f"ported trunk weights from {args.port_h5}")
    # Serving-mode BN fold (load-time, utils.fold_bn): BN is a
    # per-channel affine at inference, folded exactly into the conv
    # weights; the BN ops vanish from the served graph while weights
    # stay runtime buffers (unlike --export's constant-folding). Only
    # meaningful for BN backbones; --export keeps the unfolded graph
    # (its constant-folding already subsumes the win).
    if args.fold_bn and not args.export:
        from tfssd_tpu.utils.fold_bn import fold_for_serving

        cfg2, model2, variables2 = fold_for_serving(cfg, variables)
        if cfg2 is not cfg:
            cfg, model, variables = cfg2, model2, variables2
            print("folded BatchNorm into conv weights for serving")
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    # Data-parallel inference over every visible chip: replicate weights,
    # shard each batch over the mesh (BASELINE.md config #5's v5e-8
    # streaming shape; a 1-chip mesh makes this a no-op). Falls back to
    # one device when the batch doesn't divide the chip count.
    devices = jax.devices()
    if args.batch_size % len(devices):
        print(f"WARNING: --batch-size {args.batch_size} does not divide "
              f"the {len(devices)} visible devices; falling back to a "
              f"single device ({len(devices) - 1} idle) — use a multiple "
              f"of {len(devices)} for data-parallel inference")
        devices = devices[:1]
    mesh = get_mesh(devices)
    variables = replicate(mesh, variables)

    if args.export:
        from tfssd_tpu.utils.export import export_predict

        blob = export_predict(model, anchors, cfg,
                              jax.device_get(variables),
                              args.export_batch or args.batch_size)
        with open(args.export, "wb") as f:
            f.write(blob)
        print(f"exported predict (batch {args.export_batch or args.batch_size}, "
              f"weights baked in) to {args.export}: {len(blob)/1e6:.1f} MB")
        return

    if args.image_dir:
        dataset = list(custom_image_generator(
            get_custom_imgs(args.image_dir), cfg.img_size))
    elif args.dataset == "voc" and not args.data_root:
        raise SystemExit(
            "--dataset voc needs a --data-root VOCdevkit/VOC2007-style "
            "directory (tfds is unavailable offline); pass --dataset "
            "synthetic or --image-dir to run without VOC")
    elif args.dataset == "voc" and args.data_root:
        # --data-root is repeatable (ROOT[:SPLIT]); eval normally uses one
        # root (VOC07 test), but concatenation works here too.
        from tfssd_tpu.data import ConcatDataset
        from tfssd_tpu.utils.io import parse_data_root

        parts = [
            VOCDataset(root, split, image_size=cfg.img_size,
                       skip_difficult=False)
            for root, split in (parse_data_root(s, args.split)
                                for s in args.data_root)
        ]
        dataset = parts[0] if len(parts) == 1 else ConcatDataset(parts)
    else:
        dataset = SyntheticDataset(128, image_size=cfg.img_size, seed=10_000)

    labels = get_labels()
    os.makedirs(args.output_dir, exist_ok=True)
    gts, dets, drawn, seen = [], [], 0, 0

    # --limit caps the staged/decoded rows too: without this, --limit 8
    # on a full VOC test split would still decode ~5k images and ship
    # multi-GB to HBM. The head view also makes the auto-cache size
    # check see the limited size.
    if args.limit and args.limit < len(dataset) and not args.image_dir:
        from tfssd_tpu.data import TakeDataset

        dataset = TakeDataset(dataset, args.limit)
    use_cache = (not args.image_dir and args.device_cache != "off" and
                 (args.device_cache == "on" or
                  len(dataset) * cfg.img_size ** 2 * 3 <= 6e9))
    if use_cache:
        # Device-resident eval (trainer.py --device-cache's design): the
        # split is decoded once, shipped to HBM in one transfer, and each
        # batch is gathered + preprocessed inside the jitted predict.
        # Streamed feeding over the TPU tunnel is H2D-bound at 50-450
        # MB/s; the resident loop runs at device speed.
        import time

        from tfssd_tpu.data import stage_arrays

        jnp = jax.numpy
        host, n_real = stage_arrays(
            dataset, cfg.max_gt_boxes, workers=args.workers,
            pad_to_multiple=args.batch_size)
        # Flat (N, S*S*3) staging: see train.gather_rows — a 4-D u8
        # gather operand makes XLA relayout the whole resident split
        # inside the jit (dataset-sized extra copies).
        from tfssd_tpu.train import flatten_images

        data = shard_batch(mesh, flatten_images({"image": host["image"]}))

        from tfssd_tpu.train import gather_rows

        def _predict_cached(v, d, idx):
            return predict(v, preprocess_images(
                gather_rows(d, idx)["image"]))

        predict_cached = jax.jit(_predict_cached)
        limit_n = min(n_real, args.limit) if args.limit else n_real
        bsz = args.batch_size
        n_batches = -(-limit_n // bsz)
        # warmup: first dispatch pays the jit compile; keep it out of
        # the throughput window (its result is reused as batch 0)
        warm = predict_cached(
            variables, data, jnp.arange(bsz, dtype=jnp.int32))
        jax.block_until_ready(warm.scores)
        results = [warm]
        t0 = time.perf_counter()
        for b in range(1, n_batches):
            idx = jnp.arange(b * bsz, (b + 1) * bsz, dtype=jnp.int32)
            results.append(predict_cached(variables, data, idx))
        jax.block_until_ready([r.scores for r in results])
        dt = time.perf_counter() - t0
        # Count only REAL rows in the timed window (batches 1..n-1): the
        # final batch is padded to a multiple of bsz and padding rows
        # would overstate img/s when limit_n % bsz != 0.
        timed_real = max(0, limit_n - bsz)
        if n_batches > 1 and timed_real:
            print(f"inference: {timed_real / dt:.1f} img/s "
                  f"(device-cached, batch={bsz}, {n_batches} batches, "
                  f"padded tail excluded from the count)")
        for b, res in enumerate(results):
            nv = min(bsz, limit_n - b * bsz)
            sl = slice(b * bsz, b * bsz + nv)
            drawn = _accumulate_batch(
                res, nv,
                {"image": host["image"][sl], "boxes": host["boxes"][sl],
                 "labels": host["labels"][sl],
                 "difficult": host["difficult"][sl],
                 "ids": host["ids"][sl]},
                gts, dets, drawn, args, labels)
        if not args.no_eval:
            evaluate_predictions(gts, dets,
                                 num_classes=cfg.total_labels - 1,
                                 class_names=labels)
        return

    timer = StepTimer(skip=1)
    timer.start()
    tick_reals = []   # real images per tick (honest throughput: the
                      # padded final batch must not count batch_size)
    for batch in prefetch(batch_examples(
            dataset, args.batch_size, cfg.max_gt_boxes,
            drop_remainder=False,
            workers=args.workers if not args.image_dir else 1)):
        # shard_batch device_puts numpy directly with the data-axis
        # sharding — a jnp.asarray first would place the whole batch on
        # device 0 and re-distribute it (r5 review)
        images = preprocess_images(shard_batch(mesh, batch["image"]))
        res = predict(variables, images)
        jax.block_until_ready(res.scores)
        timer.tick()
        # truncate to the remaining --limit so the streamed path
        # evaluates EXACTLY limit images like the device-cache path
        # (r5 review: it previously finished the whole batch)
        n = batch["num_valid"]
        if args.limit:
            n = min(n, args.limit - seen)
        tick_reals.append(n)
        drawn = _accumulate_batch(res, n, batch, gts, dets, drawn,
                                  args, labels)
        seen += n
        if args.limit and seen >= args.limit:
            break

    summary = timer.summary()
    if summary:
        measured_imgs = sum(tick_reals[timer.skip:])
        total_s = sum(timer.measured)
        rate = measured_imgs / total_s if total_s else 0.0
        print(f"inference: {rate:.1f} img/s "
              f"(p50 batch {summary['p50_s'] * 1e3:.2f}ms, "
              f"batch={args.batch_size}, padded tail excluded)")
    if not args.no_eval and not args.image_dir:
        evaluate_predictions(gts, dets, num_classes=cfg.total_labels - 1,
                             class_names=labels)


if __name__ == "__main__":
    main()
