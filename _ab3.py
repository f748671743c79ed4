import time
import jax, jax.numpy as jnp, numpy as np
B, N, C, K = 256, 2268, 20, 200
rng = np.random.default_rng(0)
s = jnp.asarray(rng.random((B,N,C)), jnp.float32)
b = jnp.asarray(rng.random((B,N,4)), jnp.float32)
def rate(fn, args, iters=20, warmup=3):
    for _ in range(warmup): jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/iters*1e3
topk = jax.jit(lambda ss: jax.lax.top_k(jnp.swapaxes(ss,1,2), K))
ts_, ti_ = topk(s)
gather = jax.jit(lambda bb, ti: jnp.take_along_axis(bb, ti.reshape(B,-1)[...,None], axis=1).reshape(B,C,K,4))
both = jax.jit(lambda bb, ss: (lambda ts, ti: (ts, jnp.take_along_axis(bb, ti.reshape(B,-1)[...,None], axis=1).reshape(B,C,K,4)))(*jax.lax.top_k(jnp.swapaxes(ss,1,2), K)))
print("topk alone   ms:", round(rate(topk, (s,)),2))
print("gather alone ms:", round(rate(gather, (b, ti_)),2))
print("fused stage  ms:", round(rate(both, (b, s)),2))
# sweep N to find the cliff
for n in (1536, 1917, 2048, 2049, 2112, 2176, 2268, 2304, 2560):
    sn = jnp.asarray(rng.random((B,n,C)), jnp.float32)
    f = jax.jit(lambda ss: jax.lax.top_k(jnp.swapaxes(ss,1,2), K))
    print("N=",n," topk ms:", round(rate(f, (sn,), iters=10),2))
