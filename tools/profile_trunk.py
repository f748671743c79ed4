"""Cumulative per-block timing of the inference trunk (real TPU).

Times the forward pass truncated at successive backbone blocks using
Flax capture_intermediates + XLA dead-code elimination: jitting
`intermediates[block].sum()` compiles ONLY the prefix up to that block,
so consecutive differences attribute time per segment. Fetch-forced
timing (see bench._chain_slope's rationale: block_until_ready lies for
some executables over the serving tunnel).

r5 findings at b256 bf16 folded (total fwd ~14.0 ms of the 21.3 ms
step): stem 3.5 ms (3-input-channel conv, bandwidth/padding-bound),
blocks 1-3 +4.4 ms (the 150x150x96 expand activations — pure HBM
traffic), everything after block 10 nearly free. A space-to-depth stem
rewrite (pad 3x3 kernel to 4x4, reorder to 2x2x12, conv s1 on the
rearranged input — exact modulo fp order) measured NEGATIVE: 3.43 vs
2.89 ms, the 276 MB input rearrange costs more than the MXU lane
padding it saves. The trunk is at its practical bandwidth floor for
this architecture.

Usage (repo root, TPU): python tools/profile_trunk.py [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--backbone", default="mobilenet_v2")
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models import get_model, init_model
    from tfssd_tpu.utils.fold_bn import fold_for_serving
    from tfssd_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = get_hyper_params(args.backbone, compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    cfg, model, variables = fold_for_serving(cfg, variables)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (args.batch, cfg.img_size, cfg.img_size, 3)), jnp.float32)

    probe = model.apply(variables, x[:1], train=False,
                        capture_intermediates=True,
                        mutable=["intermediates"])
    names = [k for k in probe[1]["intermediates"]["backbone"]
             if k != "__call__"]

    def cum_time(name):
        def f(v, xx):
            _, st = model.apply(v, xx, train=False,
                                capture_intermediates=True,
                                mutable=["intermediates"])
            t = st["intermediates"]["backbone"][name]["__call__"][0]
            if isinstance(t, (list, tuple)):
                t = t[0]
            return t.astype(jnp.float32).sum()

        jf = jax.jit(f)
        float(jf(variables, x))
        t0 = time.perf_counter()
        outs = [jf(variables, x) for _ in range(args.iters)]
        float(outs[-1])
        return (time.perf_counter() - t0) / args.iters

    prev = 0.0
    for nm in names:
        t = cum_time(nm)
        print(f"to {nm:20s}: {t*1e3:7.2f} ms  (+{(t - prev)*1e3:6.2f})")
        prev = t


if __name__ == "__main__":
    main()
