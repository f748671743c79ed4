"""Stage-level timing of the TRAINING step on the real TPU.

VERDICT r2 weak #3 / next #2: training never got the stage-profiling
round inference did. This times, in streaming mode (pipelined calls /
wall-clock, CLAUDE.md's tunnel-honest recipe), each in-jit stage of the
fused train step at a given batch size:

  1. augment only          (photometric x4 + expand.crop affine + flip)
  2. match+encode only     (IoU, argmax matching, delta encoding)
  3. forward only          (train=True, bf16 trunk, BN stat updates)
  4. forward+loss+backward (value_and_grad, no optimizer)
  5. FULL step             (grads + Adam + donation, as trainer.py runs)

Stages are separately jitted closures over the same inputs, so each
number includes XLA's fusion within that stage but not across stages —
the deltas between consecutive stages bound where the step time goes.

Usage (repo root, no JAX_PLATFORMS override -> real TPU):
    python tools/profile_train_stages.py [--batch 64] [--iters 20]
                                         [--backbone mobilenet_v2]
                                         [--no-bf16] [--remat]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _time_fn
from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import SyntheticDataset, batch_examples
from tfssd_tpu.data.augment import augment_batch
from tfssd_tpu.models import get_model
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.ops.losses import ssd_losses
from tfssd_tpu.ops.matching import match_batch
from tfssd_tpu.train import (
    create_train_state, make_optimizer, make_train_step)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backbone", default="mobilenet_v2")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    cfg = get_hyper_params(
        args.backbone,
        compute_dtype="float32" if args.no_bf16 else "bfloat16",
        remat=args.remat)
    model = get_model(cfg)
    anchors = jnp.asarray(generate_anchors(cfg))
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    b = args.batch
    print(f"batch={b} anchors={cfg.total_anchors} "
          f"bf16={not args.no_bf16} remat={args.remat} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    ds = SyntheticDataset(b, image_size=cfg.img_size)
    batch = next(batch_examples(ds, b, cfg.max_gt_boxes))
    images = jnp.asarray(batch["image"]).astype(jnp.float32) / 255.0
    gt_boxes = jnp.asarray(batch["boxes"])
    gt_labels = jnp.asarray(batch["labels"])
    rng = jax.random.key(1)

    def report(name, dt):
        print(f"{name:28s} {dt * 1e3:9.3f} ms   ({b / dt:9.1f} img/s)")

    # 1. augment only
    aug = jax.jit(lambda r, i, bx, lb: augment_batch(r, i, bx, lb))
    dt = _time_fn(aug, (rng, images, gt_boxes, gt_labels), args.iters)
    report("augment", dt)

    # 2. match+encode only
    mt = jax.jit(lambda bx, lb: match_batch(anchors, bx, lb, cfg))
    dt = _time_fn(mt, (gt_boxes, gt_labels), args.iters)
    report("match+encode", dt)

    # 3. forward only (train mode, mutable BN)
    fwd = jax.jit(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=True,
        mutable=["batch_stats"]))
    x = images * 2.0 - 1.0
    dt = _time_fn(fwd, (state.params, state.batch_stats, x), args.iters)
    report("forward (train)", dt)

    # 4. forward+loss+backward (no optimizer update)
    def loss_fn(params, bs, x, bx, lb):
        ad, al = match_batch(anchors, bx, lb, cfg)
        (pd, pl), _ = model.apply({"params": params, "batch_stats": bs},
                                  x, train=True, mutable=["batch_stats"])
        total, _ = ssd_losses(ad, al, pd, pl, cfg.neg_pos_ratio,
                              cfg.loc_loss_alpha)
        return total

    bwd = jax.jit(jax.grad(loss_fn))
    dt = _time_fn(bwd, (state.params, state.batch_stats, x, gt_boxes,
                        gt_labels), args.iters)
    report("fwd+loss+bwd", dt)

    # 5. full step (augment + match + fwd + bwd + Adam), donated like
    # trainer.py. State threads through so donation is real.
    step = jax.jit(make_train_step(model, anchors, opt, augment=True),
                   donate_argnums=(0,))
    db = {"image": jnp.asarray(batch["image"]), "boxes": gt_boxes,
          "labels": gt_labels}
    import time
    for _ in range(3):
        state, _ = step(state, db, rng)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, _ = step(state, db, rng)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.iters
    report("FULL train step", dt)


if __name__ == "__main__":
    main()
