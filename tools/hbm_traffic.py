"""Corrected HBM traffic accounting from the optimized HLO (VERDICT r4
next #3).

XLA's aggregate cost analysis ("bytes accessed") over-counts real HBM
traffic — round 4's artifact showed three configs at 112-154% of the
physical HBM bandwidth, which is impossible; the counter includes reads
that fusion keeps in VMEM/registers. This tool derives a DEFENSIBLE
per-kernel traffic estimate by walking the ENTRY computation of the
compiled module's HloModuleProto (exact shapes/opcodes — no text
parsing; TPU layout annotations broke a regex-based first cut):

  traffic = sum over top-level instructions of
              (unique operand buffer bytes + output buffer bytes)

On TPU a buffer only survives between kernels through HBM, so each
top-level kernel must read its operands from HBM and write its outputs
back — while everything INSIDE a fusion stays on-chip and contributes
zero. This still over-counts reads that stay resident in VMEM between
adjacent kernels and under-counts spilled convolution windows, but it
cannot include fusion-internal traffic by construction, which is
exactly the hole the round-4 verdict flagged.

Zero-traffic opcodes: parameter/constant/iota definitions (no operand
reads; their CONSUMERS pay the read), tuple plumbing
(tuple/get-tuple-element), bitcast (layout alias). `while`/
`conditional`/`call` bodies would need trip counts — the tool errors
loudly if it meets one so a silent undercount can't happen (none of the
audited configs contain top-level loops).

Also calibrates the chip's ACHIEVABLE HBM bandwidth with a
dependence-chained streaming update of exactly-known traffic
(z <- x + y + eps*z over distinct ~0.5 GB buffers: 16 bytes/element
per iteration, chained inside ONE dispatch so the serving tunnel's RTT
cancels in the depth slope — 12 pipelined independent adds measured a
fantasy 42 TB/s over the tunnel).

Usage (repo root, real TPU):
    python tools/hbm_traffic.py [--configs mbv2-infer,mbv2-train,...]
Emits one JSON line per config; tools/mfu.py --corrected consumes the
same accounting for the MFU_r05 artifact.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# xla_data.proto PrimitiveType -> bytes per element
_ELEM_BYTES = {
    1: 1,    # PRED
    2: 1, 6: 1,          # S8, U8
    3: 2, 7: 2, 10: 2, 16: 2,   # S16, U16, F16, BF16
    4: 4, 8: 4, 11: 4,   # S32, U32, F32
    5: 8, 9: 8, 12: 8, 15: 8,   # S64, U64, F64, C64
    18: 16,  # C128
    19: 1, 20: 1, 23: 1, 24: 1, 25: 1,  # f8 family
    21: 1, 22: 1,        # S4/U4 (byte-padded storage)
}
_TUPLE = 13
_TOKEN = 17


def _shape_bytes(shape) -> int:
    """Bytes of an xla ShapeProto; tuples sum their leaves."""
    if shape.element_type == _TUPLE:
        return sum(_shape_bytes(s) for s in shape.tuple_shapes)
    if shape.element_type == _TOKEN:
        return 0
    bpe = _ELEM_BYTES.get(shape.element_type)
    if bpe is None:
        raise ValueError(f"unknown element_type {shape.element_type}")
    n = 1
    for d in shape.dimensions:
        n *= d
    return n * bpe


_FREE_OPS = {
    "parameter", "constant", "iota", "tuple", "get-tuple-element",
    "bitcast", "after-all", "partition-id", "replica-id",
}
_LOOPY_OPS = {"while", "conditional", "call"}


def entry_traffic_bytes(compiled) -> dict:
    """Walk the compiled executable's ENTRY computation; return traffic
    accounting {traffic_bytes, kernels, top_opcodes}."""
    from tensorflow.compiler.xla.service import hlo_pb2

    proto = (compiled.runtime_executable().hlo_modules()[0]
             .as_serialized_hlo_module_proto())
    hm = hlo_pb2.HloModuleProto.FromString(proto)
    entry = next(c for c in hm.computations
                 if c.id == hm.entry_computation_id)
    shapes = {ins.id: ins.shape for ins in entry.instructions}
    total = 0
    kernels = 0
    by_opcode = {}
    for ins in entry.instructions:
        if ins.opcode in _FREE_OPS:
            continue
        if ins.opcode in _LOOPY_OPS:
            raise ValueError(
                f"top-level '{ins.opcode}' ({ins.name}): body traffic "
                "needs a trip count; refusing a silent undercount")
        t = _shape_bytes(ins.shape)           # output write
        for oid in set(ins.operand_ids):      # unique operand reads
            t += _shape_bytes(shapes[oid])
        total += t
        kernels += 1
        by_opcode[ins.opcode] = by_opcode.get(ins.opcode, 0) + t
    top = sorted(by_opcode.items(), key=lambda kv: -kv[1])[:8]
    return {"traffic_bytes": total, "kernels": kernels,
            "top_opcodes": {k: round(v / 1e9, 3) for k, v in top}}


def measure_achievable_bw(gb: float = 0.5, depths=(4, 12),
                          reps: int = 3) -> float:
    """Achievable HBM bandwidth (bytes/s) from a dependence-chained
    streaming update: each chain step computes z <- x + y + 1e-7*z
    (reads x, y, z; writes z: exactly 16 bytes/element, nothing
    hoistable out of the loop since z changes). The slope between two
    chain depths inside single dispatches cancels the tunnel RTT — the
    pipelined-independent-calls version read a fantasy 42 TB/s."""
    n = int(gb * 1e9 / 4)
    x = jnp.asarray(np.random.default_rng(0).random(n, np.float32))
    y = jnp.asarray(np.random.default_rng(1).random(n, np.float32))

    def chained(k):
        # x and y MUST be arguments, not closed-over: a closure embeds
        # the 0.5 GB buffers as HLO constants, and shipping ~1 GB of
        # constants to the axon remote-compile service breaks the
        # tunnel (observed: "remote_compile ... Broken pipe").
        def run(xx, yy, z0):
            def body(z, _):
                return xx + yy + jnp.float32(1e-7) * z, ()
            return jax.lax.scan(body, z0, None, length=k)[0]
        return jax.jit(run)

    times = {}
    for k in depths:
        fn = chained(k)
        jax.block_until_ready(fn(x, y, y))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x, y, y))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = depths
    per_iter = (times[k2] - times[k1]) / (k2 - k1)
    return 16.0 * n / per_iter


def main():
    from mfu import CONFIGS, V5E_HBM_BPS, _build_train, _cost, _time_train
    from bench import _time_fn

    p = argparse.ArgumentParser()
    p.add_argument("--configs",
                   default="mbv2-infer,mbv2-train,mbv2-train-noaug")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--hbm-gbps", type=float, default=V5E_HBM_BPS / 1e9)
    p.add_argument("--skip-bw-cal", action="store_true")
    args = p.parse_args()
    from tfssd_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    hbm = args.hbm_gbps * 1e9
    bw_eff = None
    if not args.skip_bw_cal:
        bw_eff = measure_achievable_bw()
        print(f"achievable HBM bandwidth (chained triad): "
              f"{bw_eff/1e9:.1f} GB/s "
              f"({100*bw_eff/hbm:.1f}% of datasheet)", file=sys.stderr)

    for name in args.configs.split(","):
        name = name.strip()
        builder, kw, desc = CONFIGS[name]
        fn, fargs, batch = builder(**kw)
        compiled = fn.lower(*fargs).compile()
        flops, bytes_xla = _cost(compiled)
        acct = entry_traffic_bytes(compiled)
        bytes_true = acct["traffic_bytes"]
        if builder is _build_train:
            dt = _time_train(fn, fargs, args.iters)
        else:
            dt = _time_fn(fn, fargs, args.iters)
        rec = {
            "config": name,
            "desc": desc,
            "step_ms": round(dt * 1e3, 3),
            "hbm_gb_xla_counter": round(bytes_xla / 1e9, 3),
            "hbm_gb_entry_kernels": round(bytes_true / 1e9, 3),
            "overcount_x": round(bytes_xla / max(bytes_true, 1), 3),
            "kernels": acct["kernels"],
            "bw_util_pct_vs_peak": round(
                100 * bytes_true / hbm / dt, 1),
            "bw_util_pct_vs_achievable": (
                round(100 * bytes_true / bw_eff / dt, 1)
                if bw_eff else None),
            "achievable_bw_gbps": (round(bw_eff / 1e9, 1)
                                   if bw_eff else None),
            "top_opcodes_gb": acct["top_opcodes"],
        }
        print(json.dumps(rec))
        print(f"{name:18s} {dt*1e3:8.2f} ms  xla {bytes_xla/1e9:7.2f} GB  "
              f"kern {bytes_true/1e9:7.2f} GB  "
              f"util(peak) {rec['bw_util_pct_vs_peak']:5.1f}%",
              file=sys.stderr)


if __name__ == "__main__":
    main()
