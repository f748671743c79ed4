"""A/B: bilinear-gather resample vs antialiased scale_and_translate in
the in-jit augmentation (VERDICT r3 next #1 stage isolation).

MEASURED VERDICT (v5e, batch 64, 2026-08-20): scale_and_translate WINS —
4.97 vs 8.98 ms standalone, 34.3 vs 36.8 ms in the full train step. The
2-tap gather does ~300x less arithmetic but TPU row/column gathers lose
to the MXU-resident dense sampling matmuls. augment.py keeps
scale_and_translate; the gather variant is preserved here as the
measured negative. (A first reading of 22 ms for the augment stage came
from an UNTHREADED timing loop retaining 20 TrainStates — an allocator
stall, not augment cost; see tools/mfu.py _build_train.)

Times, streaming on the real device:
  1. augment_batch alone, both resample impls
  2. the FULL train step (threaded, donated), both impls

Usage (repo root, no JAX_PLATFORMS override -> real TPU):
    python tools/augment_ab.py [--batch 64] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _time_fn
from tfssd_tpu.data import augment as aug


def _apply_region_gather(img, region):
    """Separable 2-tap bilinear via row/column gathers (TF
    resize(antialias=False) semantics) — the measured LOSER on TPU."""
    size = img.shape[0]
    y0, x0, h, w = region[0], region[1], region[2], region[3]
    o = jnp.arange(size, dtype=jnp.float32) + 0.5
    py = o * h + y0 * size - 0.5
    px = o * w + x0 * size - 0.5

    def taps(p):
        i0 = jnp.floor(p)
        f = (p - i0).astype(img.dtype)
        i0i = jnp.clip(i0.astype(jnp.int32), 0, size - 1)
        return i0i, jnp.clip(i0i + 1, 0, size - 1), f

    y0i, y1i, fy = taps(py)
    x0i, x1i, fx = taps(px)
    rows = (jnp.take(img, y0i, axis=0) * (1.0 - fy)[:, None, None]
            + jnp.take(img, y1i, axis=0) * fy[:, None, None])
    out = (jnp.take(rows, x0i, axis=1) * (1.0 - fx)[None, :, None]
           + jnp.take(rows, x1i, axis=1) * fx[None, :, None])
    coords = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    in_y = (coords * h + y0 >= 0.0) & (coords * h + y0 <= 1.0)
    in_x = (coords * w + x0 >= 0.0) & (coords * w + x0 <= 1.0)
    inside = in_y[:, None, None] & in_x[None, :, None]
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    return jnp.where(inside, out, mean)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    from tfssd_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import numpy as np

    b = args.batch
    rng = jax.random.key(1)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, 300, 300, 3)),
        jnp.float32)
    boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.7]], jnp.float32),
                     (b, 1, 1))
    boxes = jnp.pad(boxes, ((0, 0), (0, 15), (0, 0)))
    labels = jnp.pad(jnp.ones((b, 1), jnp.int32), ((0, 0), (0, 15)))

    shipped_impl = aug._apply_region  # scale_and_translate (the winner)

    for name, impl in (("scale_and_translate", shipped_impl),
                       ("gather-bilinear", _apply_region_gather)):
        aug._apply_region = impl
        f = jax.jit(lambda r, i, bx, lb: aug.augment_batch(r, i, bx, lb))
        dt = _time_fn(f, (rng, images, boxes, labels), args.iters)
        print(f"augment_batch [{name:20s}] {dt*1e3:8.3f} ms "
              f"({b/dt:9.1f} img/s)")

    # full train step A/B
    import time

    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.data import SyntheticDataset, batch_examples
    from tfssd_tpu.models import get_model
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    ds = SyntheticDataset(b, image_size=cfg.img_size)
    bt = next(batch_examples(ds, b, cfg.max_gt_boxes))
    db = {k: jnp.asarray(bt[k]) for k in ("image", "boxes", "labels")}

    for name, impl in (("scale_and_translate", shipped_impl),
                       ("gather-bilinear", _apply_region_gather)):
        aug._apply_region = impl
        state = create_train_state(model, jax.random.key(0), opt)
        step = jax.jit(make_train_step(model, anchors, opt, augment=True),
                       donate_argnums=(0,))
        for _ in range(3):
            state, _ = step(state, db, rng)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = step(state, db, rng)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"train step    [{name:20s}] {dt*1e3:8.3f} ms "
              f"({b/dt:9.1f} img/s)")

    aug._apply_region = shipped_impl


if __name__ == "__main__":
    main()
