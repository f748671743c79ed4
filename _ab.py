import sys, time
if "pkg" in sys.argv:
    import tfssd_tpu  # noqa
import jax, jax.numpy as jnp, numpy as np
B, N, C, K = 256, 1917, 20, 200
rng = np.random.default_rng(0)
s = jnp.asarray(rng.random((B,N,C)), jnp.float32)
b = jnp.asarray(rng.random((B,N,4)), jnp.float32)
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
print("stage ms:", round(rate(stage, (b, s)),2))
