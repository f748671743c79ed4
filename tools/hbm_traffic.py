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
(z <- y - 0.999*z behind a per-iteration optimization_barrier over
distinct ~0.5 GB buffers: 12 bytes/element per iteration; see
measure_achievable_bw for why earlier formulations measured fantasies
over the serving tunnel).

Usage (repo root, real TPU):
    python tools/hbm_traffic.py [--configs mbv2-infer,mbv2-train,...]
Emits one JSON line per config; tools/mfu.py --corrected consumes the
same accounting for the MFU_r05 artifact.
"""

from __future__ import annotations

import argparse
import json
import sys

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


# Ops that READ only a window of their (possibly huge) operand — real
# read traffic ~ output size, not operand size. Charging the full
# operand put the r5 first cut ABOVE the XLA counter (an async-sliced
# u8 image batch was charged 280 full reads of the 17 MB source
# instead of 280 x 4 MB windows).
_WINDOW_OPS = {"slice", "dynamic-slice", "gather"}
# The *-done halves of async pairs alias buffers the start already
# accounted; their tuples re-list the operands (double/triple counting).
_ASYNC_FREE = {"copy-done", "async-done", "async-update", "send-done",
               "recv-done"}


def entry_traffic_bytes(compiled) -> dict:
    """Walk the compiled executable's ENTRY computation; return traffic
    accounting {traffic_bytes, kernels, top_opcodes}.

    Per-opcode model (each top-level kernel reads operands from HBM and
    writes outputs back; TPU buffers only survive between kernels in
    HBM):
      * default: unique operand bytes + output bytes
      * window ops (slice/dynamic-slice/gather): 2 x output bytes
      * dynamic-update-slice: 2 x update bytes (base is aliased in place)
      * copy-start: 2 x copied bytes; async-start: the wrapped op's
        traffic (window-aware); all *-done halves: 0 (alias plumbing)
    """
    from tensorflow.compiler.xla.service import hlo_pb2

    proto = (compiled.runtime_executable().hlo_modules()[0]
             .as_serialized_hlo_module_proto())
    hm = hlo_pb2.HloModuleProto.FromString(proto)
    comps = {c.id: c for c in hm.computations}
    entry = comps[hm.entry_computation_id]
    shapes = {ins.id: ins.shape for ins in entry.instructions}
    total = 0
    kernels = 0
    by_opcode = {}
    for ins in entry.instructions:
        op = ins.opcode
        if op in _FREE_OPS or op in _ASYNC_FREE:
            continue
        if op in _LOOPY_OPS:
            raise ValueError(
                f"top-level '{op}' ({ins.name}): body traffic "
                "needs a trip count; refusing a silent undercount")
        if op in _WINDOW_OPS:
            t = 2 * _shape_bytes(ins.shape)
        elif op == "dynamic-update-slice":
            t = 2 * _shape_bytes(shapes[ins.operand_ids[1]])
        elif op == "copy-start":
            t = 2 * _shape_bytes(shapes[ins.operand_ids[0]])
        elif op == "async-start":
            wrapped = comps[ins.called_computation_ids[0]]
            root = next(i for i in wrapped.instructions
                        if i.id == wrapped.root_id)
            if root.opcode in _WINDOW_OPS:
                t = 2 * _shape_bytes(root.shape)
            else:
                wshapes = {i.id: i.shape for i in wrapped.instructions}
                t = _shape_bytes(root.shape) + sum(
                    _shape_bytes(wshapes[oid])
                    for oid in set(root.operand_ids))
        else:
            t = _shape_bytes(ins.shape)           # output write
            for oid in set(ins.operand_ids):      # unique operand reads
                t += _shape_bytes(shapes[oid])
        total += t
        kernels += 1
        by_opcode[op] = by_opcode.get(op, 0) + t
    top = sorted(by_opcode.items(), key=lambda kv: -kv[1])[:8]
    return {"traffic_bytes": total, "kernels": kernels,
            "top_opcodes": {k: round(v / 1e9, 3) for k, v in top}}


def measure_achievable_bw(gb: float = 0.5, depths=(4, 12),
                          iters: int = 8) -> float:
    """Achievable HBM bandwidth (bytes/s) from a dependence-chained
    streaming update: each chain step computes z <- y - 0.999*z behind
    an optimization_barrier (reads y and z, writes z: exactly 12
    bytes/element per iteration; the barrier forces each iterate to
    materialize in HBM — without it XLA fuses the whole unrolled chain
    into one kernel whose traffic is independent of depth, and a plain
    z <- y - z chain even CSE-collapses to identity, which measured a
    NEGATIVE slope). Timing/fetch discipline lives in
    bench._chain_slope (fetch-forced two-depth slope — pipelined
    independent adds read 42 TB/s and block_until_ready chains
    1.1-1.3 PB/s over the tunnel; both fantasies). Measured on v5e:
    ~2.1 ms per 1.5 GB iteration -> 680-718 GB/s, 83-88% of the
    819 GB/s datasheet — a normal streaming efficiency, which is
    itself evidence the method is finally physical."""
    from bench import _chain_slope

    n = int(gb * 1e9 / 4)
    y = jnp.asarray(np.random.default_rng(1).random(n, np.float32))
    z0 = jnp.asarray(np.random.default_rng(2).random(n, np.float32))

    def chained(k):
        # y/z0 as arguments, not closures: closed-over 0.5 GB buffers
        # become HLO constants and break the axon remote-compile
        # service ("Broken pipe" shipping ~1 GB of constants).
        def run(yy, z):
            def body(z, _):
                z = yy - jnp.float32(0.999) * z
                return jax.lax.optimization_barrier(z), ()
            return jax.lax.scan(body, z, None, length=k)[0].sum()
        return jax.jit(run)

    per_iter = _chain_slope(chained, (y, z0), depths, reps=iters)
    return 12.0 * n / per_iter


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
