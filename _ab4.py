import time
import jax, jax.numpy as jnp, numpy as np
from tfssd_tpu import get_hyper_params
from tfssd_tpu.ops import boxes as box_ops
from tfssd_tpu.ops.boxes import generate_anchors
cfg = get_hyper_params("mobilenet_v2")
anchors = jnp.asarray(generate_anchors(cfg))
B, N, C, K, L = 256, cfg.total_anchors, 20, 200, 21
rng = np.random.default_rng(0)
deltas = jnp.asarray(rng.normal(0,0.5,(B,N,4)), jnp.float32)
logits = jnp.asarray(rng.normal(0,2,(B,N,L)), jnp.float32)
@jax.jit
def stage_decode(d, l):
    b = box_ops.clip_boxes(box_ops.decode(anchors, d, cfg.variances))
    s = jax.nn.softmax(l, axis=-1)[..., 1:]
    return b, s
b_d, s_d = stage_decode(deltas, logits)
b_d = jnp.asarray(np.asarray(b_d)); s_d = jnp.asarray(np.asarray(s_d))
b_f = jnp.asarray(rng.random((B,N,4)), jnp.float32)
s_f = jnp.asarray(rng.random((B,N,C)), jnp.float32)
def rate(fn, args, iters=20, warmup=3):
    for _ in range(warmup): jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/iters*1e3
@jax.jit
def stage(bb, ss):
    ts, ti = jax.lax.top_k(jnp.swapaxes(ss, 1, 2), K)
    tb = jnp.take_along_axis(bb, ti.reshape(B,-1)[...,None], axis=1).reshape(B,C,K,4)
    return ts, tb
topk = jax.jit(lambda ss: jax.lax.top_k(jnp.swapaxes(ss,1,2), K))
amax = jax.jit(lambda ss: jax.lax.approx_max_k(jnp.swapaxes(ss,1,2), K, recall_target=0.95))
print("stage(b_fresh, s_decode):", round(rate(stage,(b_f,s_d)),2))
print("stage(b_decode, s_fresh):", round(rate(stage,(b_d,s_f)),2))
print("topk(s_decode) alone    :", round(rate(topk,(s_d,)),2))
print("approx_max(s_decode)    :", round(rate(amax,(s_d,)),2))
ti_d = topk(s_d)[1]; ti_f = topk(s_f)[1]
g = jax.jit(lambda bb, ti: jnp.take_along_axis(bb, ti.reshape(B,-1)[...,None], axis=1).reshape(B,C,K,4))
print("gather(b_decode, ti_dec):", round(rate(g,(b_d,ti_d)),2))
print("gather(b_fresh,  ti_dec):", round(rate(g,(b_f,ti_d)),2))
print("gather(b_decode, ti_fr ):", round(rate(g,(b_d,ti_f)),2))
