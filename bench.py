"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md north_star): SSD300-MobileNetV2 inference
throughput in images/sec/chip on the available accelerator (forward +
decode + NMS, the full predictor path, bf16 trunk, batch 256 streaming —
BASELINE.md config #5 shape). vs_baseline compares against the 5000
img/s/chip target.

Extra configs (BASELINE.md #1..#4) can be run with --config; the default
run prints only the headline JSON line for the driver.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_IMG_PER_S = 5000.0


def _time_fn(fn, args, iters: int, warmup: int = 3,
             streaming: bool = True) -> float:
    """Seconds per call.

    streaming=True (throughput mode): submit `iters` calls back-to-back
    and divide total wall-clock by iters — the steady-state pipelined rate
    a serving loop sees (and what BASELINE.md's batch-256 streaming config
    means). streaming=False: median of individually-synchronized calls
    (latency mode, used for the p50 configs).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    if streaming:
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_inference(batch_size: int = 256, iters: int = 20,
                    backbone: str = "mobilenet_v2",
                    bf16: bool = True):
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models import get_model, init_model, make_predict_fn
    from tfssd_tpu.ops.boxes import generate_anchors

    cfg = get_hyper_params(
        backbone, compute_dtype="bfloat16" if bf16 else "float32")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1,
                                         (batch_size, cfg.img_size,
                                          cfg.img_size, 3)),
        jnp.float32)
    dt = _time_fn(predict, (variables, images), iters)
    return batch_size / dt, dt


def bench_train(batch_size: int = 32, iters: int = 10,
                backbone: str = "mobilenet_v2", bf16: bool = True):
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.data import SyntheticDataset, batch_examples
    from tfssd_tpu.models import get_model
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    cfg = get_hyper_params(
        backbone, compute_dtype="bfloat16" if bf16 else "float32")
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(make_train_step(model, anchors, opt, augment=True))
    ds = SyntheticDataset(batch_size, image_size=cfg.img_size)
    batch = next(batch_examples(ds, batch_size, cfg.max_gt_boxes))
    batch = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    rng = jax.random.key(1)

    # step mutates state; time with a fixed state for a steady measurement
    def one(state_in):
        s, m = step(state_in, batch, rng)
        return m["loss"]

    dt = _time_fn(one, (state,), iters)
    return batch_size / dt, dt


def bench_nms_p50(batch_size: int = 1, iters: int = 50,
                  backbone: str = "mobilenet_v2"):
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models.decoder import decode_predictions
    from tfssd_tpu.ops.boxes import generate_anchors

    cfg = get_hyper_params(backbone)
    anchors = jnp.asarray(generate_anchors(cfg))
    rng = np.random.default_rng(0)
    deltas = jnp.asarray(rng.normal(0, 0.5, (batch_size, cfg.total_anchors,
                                             4)), jnp.float32)
    logits = jnp.asarray(rng.normal(0, 2, (batch_size, cfg.total_anchors,
                                           cfg.total_labels)), jnp.float32)
    fn = jax.jit(lambda d, l: decode_predictions(anchors, d, l, cfg))
    dt = _time_fn(fn, (deltas, logits), iters, streaming=False)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="headline",
                   choices=("headline", "infer-b1", "train", "vgg-train",
                            "vgg-infer", "ssd512-nms", "all"))
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    if args.config == "headline":
        img_s, dt = bench_inference(args.batch_size or 256, args.iters)
        per_chip = img_s / jax.device_count()
        print(json.dumps({
            "metric": "ssd300_mbv2_infer_images_per_sec_per_chip",
            "value": round(per_chip, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(per_chip / TARGET_IMG_PER_S, 4),
        }))
        return

    if args.config in ("infer-b1", "all"):
        img_s, dt = bench_inference(1, max(args.iters, 50))
        print(json.dumps({"metric": "infer_b1_latency_p50", "value":
                          round(dt * 1e3, 3), "unit": "ms"}))
    if args.config in ("train", "all"):
        img_s, dt = bench_train(args.batch_size or 64, args.iters)
        print(json.dumps({"metric": "train_mbv2_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec"}))
    if args.config in ("vgg-train", "all"):
        img_s, dt = bench_train(args.batch_size or 16, args.iters,
                                backbone="vgg16")
        print(json.dumps({"metric": "train_vgg16_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec"}))
    if args.config in ("vgg-infer", "all"):
        img_s, dt = bench_inference(args.batch_size or 128, args.iters,
                                    backbone="vgg16")
        print(json.dumps({"metric": "infer_vgg16_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec"}))
    if args.config in ("ssd512-nms", "all"):
        dt = bench_nms_p50(backbone="vgg16_512")
        print(json.dumps({"metric": "ssd512_decode_nms_p50",
                          "value": round(dt * 1e3, 3), "unit": "ms"}))


if __name__ == "__main__":
    main()
