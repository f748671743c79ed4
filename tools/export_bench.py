"""Measure the exported-artifact serving path vs the live jitted predict.

Evidence for `predictor.py --export` (utils/export.py): the deserialized
StableHLO artifact must run at the same throughput as the in-process
jitted predict — the export is a packaging change, not a perf trade.

Usage (repo root; real TPU when launched without JAX_PLATFORMS):
    python tools/export_bench.py [--batch 256] [--iters 20]

Prints live img/s, artifact img/s, and the artifact size.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tfssd_tpu import get_hyper_params
from tfssd_tpu.models import get_model, init_model, make_predict_fn
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.utils.export import export_predict, load_exported
from tfssd_tpu.utils.profiling import enable_persistent_compile_cache


def _throughput(fn, args_, iters, batch):
    jax.block_until_ready(fn(*args_).scores)
    t0 = time.perf_counter()
    outs = [fn(*args_) for _ in range(iters)]
    jax.block_until_ready([o.scores for o in outs])
    return batch * iters / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    enable_persistent_compile_cache()

    cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(
            -1, 1, (args.batch, cfg.img_size, cfg.img_size, 3)),
        jnp.float32)

    live = _throughput(predict, (variables, images), args.iters, args.batch)
    print(f"live jit predict:     {live:,.1f} img/s", flush=True)

    blob = export_predict(model, anchors, cfg, jax.device_get(variables),
                          batch_size=args.batch)
    serve = load_exported(blob)
    exported = _throughput(serve, (images,), args.iters, args.batch)
    print(f"deserialized artifact: {exported:,.1f} img/s "
          f"({len(blob)/1e6:.1f} MB, ratio {exported/live:.3f})", flush=True)


if __name__ == "__main__":
    main()
