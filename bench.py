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
import os
import time

import jax

# The image's sitecustomize pins the axon TPU platform through jax.config,
# so `JAX_PLATFORMS=cpu python bench.py` would silently still run on the
# TPU. Honor the env var the way tests/conftest.py does: re-assert it
# through jax.config before the backend initializes.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TARGET_IMG_PER_S = 5000.0

_HEADLINE_METRIC = "ssd300_mbv2_infer_images_per_sec_per_chip"


def _probe_backend_once(timeout_s: int) -> tuple:
    """(ok, detail) from ONE subprocess backend probe.

    The axon tunnel's failure mode is a hang (jax.devices() spins in a
    claim-retry nanosleep loop — CLAUDE.md), so the probe MUST run in a
    subprocess that can be killed on timeout without taking this process
    down. This is exactly the documented recovery probe
    (`timeout 60 python -c "import jax; print(jax.devices())"`) in
    harness form.
    """
    import subprocess
    import sys
    code = "import jax; print('PROBE_OK', len(jax.devices()))"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return False, f"probe hung past {timeout_s}s (wedged tunnel?)"
    if proc.returncode == 0 and "PROBE_OK" in proc.stdout:
        return True, proc.stdout.strip().split()[-1]
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return False, (tail[-1][-300:] if tail else f"rc={proc.returncode}")


def ensure_backend_alive(probe_timeout_s: int = 90,
                         backoffs=(30, 60, 120, 240)) -> str | None:
    """Pre-flight: return None if the backend answers, else an error
    string after bounded retries (~14 min worst case).

    Round 4's driver bench died with rc=1 on `Unable to initialize
    backend 'axon': UNAVAILABLE` — a wedged serving tunnel, a condition
    that clears with time. Probe in a subprocess BEFORE this process
    touches the backend (a failed in-process init can't be retried:
    jax pins the platform), retrying with backoff so a recovering
    tunnel still yields a real number instead of a lost round.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return None                       # CPU is always available
    attempts = len(backoffs) + 1
    detail = ""
    for i in range(attempts):
        ok, detail = _probe_backend_once(probe_timeout_s)
        if ok:
            if i:
                print(f"# backend probe recovered on attempt {i + 1}",
                      flush=True)
            return None
        print(f"# backend probe {i + 1}/{attempts} failed: {detail}",
              flush=True)
        if i < len(backoffs):
            time.sleep(backoffs[i])
    return (f"axon backend unavailable after {attempts} probes "
            f"(last: {detail})")


# The successfully-emitted headline record, if any — a crash in a LATER
# config (--config all) must not overwrite a real measurement with a
# null record, since the driver parses the LAST stdout line.
_headline_record = None


def _emit_failure(error: str) -> None:
    """The driver parses our LAST stdout line as JSON; a crash must
    still produce one (round 4's record was simply absent — rc=1,
    parsed null). If the headline already printed, RE-EMIT it (with the
    error attached) so the final line keeps the real value."""
    if _headline_record is not None:
        print(json.dumps({**_headline_record,
                          "post_headline_error": error[-600:]}),
              flush=True)
        return
    print(json.dumps({"metric": _HEADLINE_METRIC, "value": None,
                      "unit": "images/sec/chip", "vs_baseline": None,
                      "error": error[-600:]}), flush=True)


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
                    bf16: bool = True, fold_bn: bool = False):
    """Global-batch inference throughput (images/sec over ALL chips).

    The batch is sharded over a data-parallel mesh and the params are
    replicated, so the number is valid at any visible device count —
    per-chip = total / jax.device_count() is then correct by
    construction (VERDICT r1 weak #2). batch_size is rounded up to a
    multiple of the device count. fold_bn serves the BN-folded model
    (utils.fold_bn), the predictor's load-time serving mode.
    """
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models import get_model, init_model, make_predict_fn
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.parallel import get_mesh, replicate, shard_batch

    cfg = get_hyper_params(
        backbone, compute_dtype="bfloat16" if bf16 else "float32")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    if fold_bn:
        from tfssd_tpu.utils.fold_bn import fold_for_serving

        cfg, model, variables = fold_for_serving(cfg, variables)
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    ndev = jax.device_count()
    batch_size = -(-batch_size // ndev) * ndev
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1,
                                         (batch_size, cfg.img_size,
                                          cfg.img_size, 3)),
        jnp.float32)
    if ndev > 1:
        mesh = get_mesh()
        variables = replicate(mesh, variables)
        images = shard_batch(mesh, images)
    dt = _time_fn(predict, (variables, images), iters)
    return batch_size / dt, dt


def bench_latency_p50(batch_size: int = 1, iters: int = 50,
                      backbone: str = "mobilenet_v2"):
    """(p50, pipelined) seconds per call, BOTH measured on the same
    unsharded single-device predict at the exact requested batch — so
    the tunnel_suspect cross-check (p50 below the pipelined bound is
    physically impossible) compares commensurate quantities.
    bench_inference would round the batch up to the device count and
    shard it, which is the wrong shape for a batch-1 latency config on
    a multi-device platform."""
    predict, variables, images = _build_serving_predict(backbone,
                                                        batch_size)
    p50 = _time_fn(predict, (variables, images), iters, streaming=False)
    piped = _time_fn(predict, (variables, images), iters, streaming=True)
    return p50, piped


def _build_serving_predict(backbone: str, batch_size: int):
    """(jitted predict, variables, images) in the SERVING configuration
    (bf16 trunk, BN folded for BN backbones — predictor.py's load-time
    default), for the latency configs."""
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.models import get_model, init_model, make_predict_fn
    from tfssd_tpu.ops.boxes import generate_anchors

    cfg = get_hyper_params(backbone, compute_dtype="bfloat16")
    model = get_model(cfg)
    variables = init_model(model, jax.random.key(0))
    from tfssd_tpu.utils.fold_bn import fold_for_serving

    cfg, model, variables = fold_for_serving(cfg, variables)
    anchors = generate_anchors(cfg)
    predict = jax.jit(make_predict_fn(model, anchors, cfg))
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1,
                                         (batch_size, cfg.img_size,
                                          cfg.img_size, 3)), jnp.float32)
    return predict, variables, images


def _chain_slope(make_chained, args, depths=(25, 100),
                 reps: int = 5) -> float:
    """Per-iteration PHYSICAL device time from a two-depth chain slope.

    make_chained(k) must return a jitted callable over `args` whose k
    iterations are data-dependent (serialized on device) and whose
    result is a SCALAR. The scalar is FETCHED to host inside the timed
    region: block_until_ready does not reliably await execution for
    every executable over the axon serving tunnel (CLAUDE.md r5
    finding — fantasy TB/s readings), while a host fetch of a value
    does, and the device queue is serial. The slope between the two
    depths cancels the constant dispatch/RTT/reduce/fetch term exactly.
    Shared by bench_latency_device, bench_nms_device, and
    tools/hbm_traffic.measure_achievable_bw.
    """
    times = {}
    for k in depths:
        fn = make_chained(k)
        float(fn(*args))          # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))      # host fetch forces completion
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = depths
    return (times[k2] - times[k1]) / (k2 - k1)


def bench_latency_device(batch_size: int = 1,
                         backbone: str = "mobilenet_v2",
                         depths=(25, 100), reps: int = 5) -> float:
    """PHYSICAL per-call device latency of the full predict path
    (seconds), immune to the serving tunnel's ~20 ms round trip.

    Method: chain K sequentially-dependent predicts inside ONE jitted
    lax.scan dispatch (each iteration's input consumes the previous
    output's scores so XLA cannot overlap them) and take the two-depth
    slope (_chain_slope). This answers BASELINE config #1 with a number
    that means something off the tunnel (VERDICT r3 weak #4); the
    wall-clock p50 beside it measures the tunnel, not the chip.
    """
    predict, variables, images = _build_serving_predict(backbone,
                                                        batch_size)

    def chained(k):
        def body(img, _):
            res = predict(variables, img)
            # data dependence: scores feed (as exact zero) into the next
            # iteration's input, serializing the chain on device
            return img + (res.scores.sum() * 0).astype(img.dtype), ()

        return jax.jit(
            lambda im: jax.lax.scan(body, im, None, length=k)[0].sum())

    return _chain_slope(chained, (images,), depths, reps)


def bench_train(batch_size: int = 32, iters: int = 10,
                backbone: str = "mobilenet_v2", bf16: bool = True,
                use_pallas: bool = False, remat: bool = False):
    """Steady-state train-step throughput, state threaded through the
    donated step exactly as trainer.py runs it (donate_argnums=(0,):
    the old TrainState's buffers are reused in place)."""
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.data import SyntheticDataset, batch_examples
    from tfssd_tpu.models import get_model
    from tfssd_tpu.ops.boxes import generate_anchors
    from tfssd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    from tfssd_tpu.parallel import get_mesh, replicate, shard_batch

    cfg = get_hyper_params(
        backbone, compute_dtype="bfloat16" if bf16 else "float32",
        use_pallas=use_pallas, remat=remat)
    model = get_model(cfg)
    anchors = generate_anchors(cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(make_train_step(model, anchors, opt, augment=True),
                   donate_argnums=(0,))
    ndev = jax.device_count()
    batch_size = -(-batch_size // ndev) * ndev
    ds = SyntheticDataset(batch_size, image_size=cfg.img_size)
    batch = next(batch_examples(ds, batch_size, cfg.max_gt_boxes))
    batch = {k: jnp.asarray(batch[k]) for k in ("image", "boxes", "labels")}
    rng = jax.random.key(1)
    if ndev > 1:
        mesh = get_mesh()
        state = replicate(mesh, state)
        batch = shard_batch(mesh, batch)

    for _ in range(3):  # warmup (compile + steady clocks)
        state, _ = step(state, batch, rng)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
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
    p50 = _time_fn(fn, (deltas, logits), iters, streaming=False)
    piped = _time_fn(fn, (deltas, logits), iters, streaming=True)
    return p50, piped


def bench_nms_device(batch_size: int = 1, backbone: str = "mobilenet_v2",
                     depths=(25, 100), reps: int = 5) -> float:
    """PHYSICAL decode+NMS device latency (seconds) by the same
    RTT-cancelling chain-slope method as bench_latency_device — the p50
    the wall clock reports for these configs is tunnel-dominated
    (VERDICT r4 weak #2: the NMS rows had no tunnel-independent
    number). Each chained iteration's deltas consume the previous
    result's scores, so XLA cannot overlap iterations."""
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

    def chained(k):
        def body(d, _):
            res = decode_predictions(anchors, d, logits, cfg)
            return d + (res.scores.sum() * 0).astype(d.dtype), ()

        return jax.jit(
            lambda dd: jax.lax.scan(body, dd, None, length=k)[0].sum())

    return _chain_slope(chained, (deltas,), depths, reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="headline",
                   choices=("headline", "infer-b1", "train", "train-256",
                            "train-e2e", "vgg-train", "vgg-train-64",
                            "vgg-infer", "ssd512-train", "ssd512-infer",
                            "nms", "ssd512-nms", "all"))
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--pallas", action="store_true",
                   help="route the train configs through the Pallas "
                        "fused match+encode kernel (use_pallas=True)")
    p.add_argument("--no-probe", action="store_true",
                   help="skip the pre-flight backend probe (e.g. when "
                        "the caller already holds the chip)")
    args = p.parse_args()
    if not args.no_probe:
        err = ensure_backend_alive()
        if err is not None:
            _emit_failure(err)
            return
    # Warm-start jit compiles from the persistent XLA cache.
    from tfssd_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    if args.config in ("headline", "all"):
        # fold_bn=True is the shipped serving configuration
        # (predictor.py folds BN into conv weights at load by default;
        # exact affine, A/B: +2.6%, 8.86k vs 8.64k img/s interleaved).
        img_s, dt = bench_inference(args.batch_size or 256, args.iters,
                                    fold_bn=True)
        per_chip = img_s / jax.device_count()
        global _headline_record
        _headline_record = {
            "metric": "ssd300_mbv2_infer_images_per_sec_per_chip",
            "value": round(per_chip, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(per_chip / TARGET_IMG_PER_S, 4),
            "config": "SSD300-MBv2 batch-256 streaming, bf16 trunk, "
                      "BN folded into convs (serving default), full "
                      "forward+decode+NMS (BASELINE #5)",
        }
        print(json.dumps(_headline_record))
        if args.config == "headline":
            return

    if args.config in ("infer-b1", "all"):
        # Single-call block_until_ready latency is unreliable over the
        # axon tunnel (CLAUDE.md); cross-check the p50 against the
        # pipelined per-call bound — a p50 below the pipelined bound is
        # physically impossible and marks the number tunnel-suspect.
        p50, piped = bench_latency_p50(1, max(args.iters, 50))
        device = bench_latency_device(1)
        print(json.dumps({"metric": "infer_b1_latency_p50",
                          "value": round(p50 * 1e3, 3), "unit": "ms",
                          "pipelined_ms": round(piped * 1e3, 3),
                          "device_ms": round(device * 1e3, 3),
                          "tunnel_suspect": bool(p50 < piped),
                          "config": "SSD300-MBv2 batch-1 full predict "
                                    "path (BASELINE #1); device_ms is "
                                    "the physical on-chip per-call time "
                                    "(serialized in-dispatch chain, RTT "
                                    "cancelled), p50 includes the "
                                    "serving tunnel"}))
    if args.config in ("train", "all"):
        img_s, dt = bench_train(args.batch_size or 64, args.iters,
                                use_pallas=args.pallas)
        print(json.dumps({"metric": "train_mbv2_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "pallas_matcher": args.pallas,
                          "config": "SSD300-MBv2 train step, batch 64, "
                                    "bf16, full in-jit augmentation "
                                    "(BASELINE #2)"}))
    if args.config in ("train-256", "all"):
        # No remat: MBv2 b256 activations fit v5e's 16 GB, and remat's
        # extra forward FLOPs are a measured negative here too (r4:
        # 2,160 img/s no-remat vs 1,872 with remat — same pattern as
        # VGG16 b64).
        img_s, dt = bench_train(256, args.iters, remat=False)
        print(json.dumps({"metric": "train_mbv2_b256_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "config": "SSD300-MBv2 train step, batch 256, "
                                    "bf16, no remat (BASELINE #2 "
                                    "scaled)"}))
    if args.config in ("train-e2e", "all"):
        # Honest END-TO-END training throughput: trainer.py as a user
        # runs it — host data loading, per-epoch validation, async orbax
        # checkpointing — not just the jitted step. The trainer times the
        # post-first-epoch window itself and emits the JSON record
        # (VERDICT r2 weak #3: the step-vs-loop gap must be measured).
        # VOC07+12-sized epochs (16,512 images = 258 steps at batch 64,
        # default val/ckpt cadence): the earlier 2,560-image config
        # amortized fixed per-epoch overheads over ~1.4 s of compute and
        # understated the loop by construction (VERDICT r3 weak #3).
        import subprocess
        import sys as _sys
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            proc = subprocess.run(
                [_sys.executable, "trainer.py", "--dataset", "synthetic",
                 "--backbone", "mobilenet_v2", "--bf16",
                 "--batch-size", "64", "--epochs", "4",
                 "--synthetic-size", "16512",
                 "--steps-per-call", "64", "--log-every", "256",
                 "--model-dir", os.path.join(td, "ckpt"),
                 "--log-dir", os.path.join(td, "logs")],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            emitted = [ln for ln in proc.stdout.splitlines()
                       if ln.startswith("{")]
            if proc.returncode == 0 and emitted:
                print(emitted[-1])
            else:
                print(json.dumps({"metric": "train_mbv2_e2e_images_per_sec",
                                  "value": None, "unit": "images/sec",
                                  "error": (proc.stderr or "")[-500:]}))
    if args.config in ("vgg-train", "all"):
        img_s, dt = bench_train(args.batch_size or 16, args.iters,
                                backbone="vgg16", use_pallas=args.pallas)
        print(json.dumps({"metric": "train_vgg16_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "config": "SSD300-VGG16 train step, batch 16, "
                                    "bf16 (BASELINE #3)"}))
    if args.config in ("vgg-train-64", "all"):
        # The reference trains VGG16 at small batches (GPU memory); on
        # TPU batch 64 fits WITHOUT remat (~3 GB activations) and VGG16
        # is compute-bound/batch-invariant: measured 521 img/s at b64
        # no-remat vs 517 at b16 vs 422 at b64+remat (remat's ~30%
        # extra forward FLOPs are a measured negative here).
        img_s, dt = bench_train(64, args.iters, backbone="vgg16",
                                use_pallas=args.pallas, remat=False)
        print(json.dumps({"metric": "train_vgg16_b64_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "config": "SSD300-VGG16 train step, batch 64, "
                                    "bf16, no remat (BASELINE #3 at TPU "
                                    "batch size)"}))
    if args.config in ("vgg-infer", "all"):
        img_s, dt = bench_inference(args.batch_size or 128, args.iters,
                                    backbone="vgg16")
        print(json.dumps({"metric": "infer_vgg16_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "config": "SSD300-VGG16 batch-128 streaming, "
                                    "bf16"}))
    if args.config in ("ssd512-infer", "all"):
        img_s, dt = bench_inference(args.batch_size or 64,
                                    args.iters, backbone="vgg16_512")
        print(json.dumps({"metric": "infer_ssd512_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "config": "SSD512-VGG16 batch-64 streaming, "
                                    "bf16, 24564 anchors, full "
                                    "forward+decode+NMS (BASELINE #4)"}))
    if args.config in ("ssd512-train", "all"):
        # BASELINE #4 covered for TRAINING too (VERDICT r3 next #6):
        # 24,564-anchor matching + VGG16-512 fwd/bwd. b16 no-remat fits
        # v5e's 16 GB (measured); remat is the documented fallback for
        # bigger batches.
        remat = False
        try:
            img_s, dt = bench_train(args.batch_size or 16, args.iters,
                                    backbone="vgg16_512", remat=False)
        except Exception as e:
            # Only an HBM OOM justifies the remat fallback; anything
            # else (tunnel flake, regression) must surface, not be
            # silently relabeled as a remat measurement.
            msg = str(e)
            if not ("RESOURCE_EXHAUSTED" in msg
                    or "Ran out of memory" in msg or "hbm" in msg):
                raise
            remat = True
        if remat:
            # Retry OUTSIDE the except block: the caught exception's
            # traceback pins the failed attempt's frame (replicated
            # state + Adam moments still resident in HBM); Python drops
            # `e` when the except clause exits, freeing that headroom
            # before the remat compile.
            img_s, dt = bench_train(args.batch_size or 16, args.iters,
                                    backbone="vgg16_512", remat=True)
        print(json.dumps({"metric": "train_ssd512_images_per_sec",
                          "value": round(img_s, 2), "unit": "images/sec",
                          "remat": remat,
                          "config": "SSD512-VGG16 train step, batch "
                                    f"{args.batch_size or 16}, bf16, "
                                    "24564 anchors, full in-jit "
                                    "augmentation (BASELINE #4 train)"}))
    if args.config in ("nms", "all"):
        p50, piped = bench_nms_p50(backbone="mobilenet_v2")
        device = bench_nms_device(backbone="mobilenet_v2")
        print(json.dumps({"metric": "ssd300_decode_nms_p50",
                          "value": round(p50 * 1e3, 3), "unit": "ms",
                          "pipelined_ms": round(piped * 1e3, 3),
                          "device_ms": round(device * 1e3, 3),
                          "tunnel_suspect": bool(p50 < piped),
                          "config": "SSD300-MBv2 decode+NMS only, batch 1"
                                    "; device_ms is the physical on-chip "
                                    "per-call time (chain-slope, RTT "
                                    "cancelled)"}))
    if args.config in ("ssd512-nms", "all"):
        p50, piped = bench_nms_p50(backbone="vgg16_512")
        device = bench_nms_device(backbone="vgg16_512")
        print(json.dumps({"metric": "ssd512_decode_nms_p50",
                          "value": round(p50 * 1e3, 3), "unit": "ms",
                          "pipelined_ms": round(piped * 1e3, 3),
                          "device_ms": round(device * 1e3, 3),
                          "tunnel_suspect": bool(p50 < piped),
                          "config": "SSD512 decode+NMS only, batch 1, "
                                    "24564 anchors; device_ms is the "
                                    "physical on-chip per-call time "
                                    "(chain-slope, RTT cancelled)"}))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # Whatever happens mid-bench (backend dying after a clean
        # probe, OOM, a regression), the driver must still read one
        # parseable JSON line — never an empty record.
        import traceback
        tb = traceback.format_exc().strip().splitlines()
        _emit_failure(" | ".join(tb[-3:]))
        raise SystemExit(0)
