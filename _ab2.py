import sys, time
import jax, jax.numpy as jnp, numpy as np
mode = sys.argv[1] if len(sys.argv)>1 else "full"
B, N, C, K, L = 256, 2268, 20, 200, 21
rng = np.random.default_rng(0)
deltas = jnp.asarray(rng.normal(0,0.5,(B,N,4)), jnp.float32)
logits = jnp.asarray(rng.normal(0,2,(B,N,L)), jnp.float32)
def rate(fn, args, iters=20, warmup=3):
    for _ in range(warmup): jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/iters*1e3

if mode in ("full", "decode"):
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.ops import boxes as box_ops
    from tfssd_tpu.ops.boxes import generate_anchors
    cfg = get_hyper_params("mobilenet_v2")
    anchors = jnp.asarray(generate_anchors(cfg))
    @jax.jit
    def stage_decode(d, l):
        b = box_ops.clip_boxes(box_ops.decode(anchors, d, cfg.variances))
        s = jax.nn.softmax(l, axis=-1)[..., 1:]
        return b, s
    b_, s_ = stage_decode(deltas, logits)
    if mode == "decode":  # re-make on host with same values
        b_, s_ = jnp.asarray(np.asarray(b_)), jnp.asarray(np.asarray(s_))
else:
    b_ = jnp.asarray(rng.random((B,N,4)), jnp.float32)
    s_ = jnp.asarray(rng.random((B,N,C)), jnp.float32)

@jax.jit
def stage_topk(bb, ss):
    ts, ti = jax.lax.top_k(jnp.swapaxes(ss, 1, 2), K)
    tb = jnp.take_along_axis(bb, ti.reshape(B,-1)[...,None], axis=1).reshape(B,C,K,4)
    return ts, tb
print(mode, "topk stage ms:", round(rate(stage_topk, (b_, s_)),2))
