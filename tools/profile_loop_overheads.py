"""Time the NON-step components of the training loop on the real TPU.

VERDICT r2 weak #3: trainer.py end-to-end runs ~79 img/s while the jitted
step runs ~1,780 img/s. The step bench reuses a device-resident batch, so
the gap must live in the loop glue. This times each piece in isolation:

  1. host batch production  (SyntheticDataset -> batch_examples, /batch)
  2. host->device transfer  (shard_batch of one 64-image batch, tunnel)
  3. full-state device_get  (the checkpoint snapshot, params+opt_state)
  4. eval_step              (one val batch incl. transfer)
  5. steady train step      (reference point, device-resident batch)

Usage (repo root, no JAX_PLATFORMS override -> real TPU):
    python tools/profile_loop_overheads.py [--batch 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import SyntheticDataset, batch_examples
from tfssd_tpu.models import get_model
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.parallel import get_mesh, replicate, shard_batch
from tfssd_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    B = args.batch

    cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    mesh = get_mesh()
    state = replicate(mesh, state)
    step = jax.jit(make_train_step(model, anchors, opt, augment=True),
                   donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model, anchors))
    rng = jax.random.key(1)

    ds = SyntheticDataset(B * args.iters, image_size=cfg.img_size, seed=0)

    # 1. host batch production
    t0 = time.perf_counter()
    host_batches = []
    for b in batch_examples(ds, B, cfg.max_gt_boxes, workers=8):
        host_batches.append(b)
    dt = (time.perf_counter() - t0) / len(host_batches)
    print(f"1. host batch production: {dt*1e3:8.1f} ms/batch "
          f"({B/dt:,.0f} img/s)")

    # 2. host->device transfer (shard_batch + block)
    hb = {k: host_batches[0][k] for k in ("image", "boxes", "labels")}
    nbytes = sum(v.nbytes for v in hb.values())
    db = shard_batch(mesh, hb)  # warmup
    jax.block_until_ready(db["image"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        hbi = {k: host_batches[i % len(host_batches)][k]
               for k in ("image", "boxes", "labels")}
        db = shard_batch(mesh, hbi)
        jax.block_until_ready(db["image"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"2. host->device transfer: {dt*1e3:8.1f} ms/batch "
          f"({nbytes/dt/1e6:,.0f} MB/s, {nbytes/1e6:.1f} MB/batch)")

    # 3. full-state device_get (checkpoint snapshot)
    state_bytes = sum(x.nbytes for x in jax.tree.leaves(state))
    t0 = time.perf_counter()
    snap = jax.device_get(state)
    dt = time.perf_counter() - t0
    print(f"3. full-state device_get: {dt*1e3:8.1f} ms "
          f"({state_bytes/dt/1e6:,.0f} MB/s, {state_bytes/1e6:.1f} MB)")
    del snap

    # 4. eval_step incl. transfer
    out = eval_step(state, db)
    jax.block_until_ready(out["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        hbi = {k: host_batches[i % len(host_batches)][k]
               for k in ("image", "boxes", "labels")}
        dbi = shard_batch(mesh, hbi)
        loss = float(eval_step(state, dbi)["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"4. eval_step (w/ xfer):   {dt*1e3:8.1f} ms/batch "
          f"({B/dt:,.0f} img/s)")

    # 5. steady train step, device-resident batch (reference point)
    for _ in range(3):
        state, _ = step(state, db, rng)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, _ = step(state, db, rng)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"5. train step (resident): {dt*1e3:8.1f} ms/step "
          f"({B/dt:,.0f} img/s)")

    # 6. train step fed like the real loop (fresh host batch each step)
    t0 = time.perf_counter()
    for i in range(args.iters):
        hbi = {k: host_batches[i % len(host_batches)][k]
               for k in ("image", "boxes", "labels")}
        dbi = shard_batch(mesh, hbi)
        state, _ = step(state, dbi, rng)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"6. train step (host-fed): {dt*1e3:8.1f} ms/step "
          f"({B/dt:,.0f} img/s)")


if __name__ == "__main__":
    main()
