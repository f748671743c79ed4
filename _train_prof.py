import time
import jax, jax.numpy as jnp, numpy as np
from tfssd_tpu import get_hyper_params
from tfssd_tpu.data import SyntheticDataset, batch_examples
from tfssd_tpu.data.augment import augment_batch
from tfssd_tpu.models import get_model
from tfssd_tpu.ops.boxes import generate_anchors
from tfssd_tpu.ops.matching import match_batch
from tfssd_tpu.ops.kernels.match_encode import match_batch_pallas
from tfssd_tpu.ops.losses import ssd_losses
from tfssd_tpu.train import create_train_state, make_optimizer, make_train_step
import optax

B = 64
cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
model = get_model(cfg)
anchors = jnp.asarray(generate_anchors(cfg))
opt = make_optimizer(1e-3)
state = create_train_state(model, jax.random.key(0), opt)
ds = SyntheticDataset(B, image_size=300)
batch = next(batch_examples(ds, B, cfg.max_gt_boxes))
images = jnp.asarray(batch["image"], jnp.float32) / 255.0
boxes, labels = jnp.asarray(batch["boxes"]), jnp.asarray(batch["labels"])
rng = jax.random.key(1)

def timeit_total(f, args, n=20):
    jax.block_until_ready(f(*args)); jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n

aug = jax.jit(augment_batch)
print(f"augment:        {timeit_total(aug, (rng, images, boxes, labels))*1e3:.2f} ms")

mj = jax.jit(lambda b, l: match_batch(anchors, b, l, cfg))
print(f"match jnp:      {timeit_total(mj, (boxes, labels))*1e3:.2f} ms")
mp = jax.jit(lambda b, l: match_batch_pallas(anchors, b, l, cfg))
print(f"match pallas:   {timeit_total(mp, (boxes, labels))*1e3:.2f} ms")

deltas_t, labels_t = mj(boxes, labels)

def fwdbwd(params, bs, imgs):
    def loss_fn(p):
        (pd, pl_), upd = model.apply({"params": p, "batch_stats": bs},
                                     imgs, train=True,
                                     mutable=["batch_stats"])
        total, _ = ssd_losses(deltas_t, labels_t, pd, pl_)
        return total
    return jax.grad(loss_fn)(params)
fb = jax.jit(fwdbwd)
print(f"fwd+bwd:        {timeit_total(fb, (state.params, state.batch_stats, images), 10)*1e3:.2f} ms")

def lossonly(pd, pl_):
    total, _ = ssd_losses(deltas_t, labels_t, pd, pl_)
    return total
pd = jnp.zeros((B, cfg.total_anchors, 4)); pl_ = jnp.zeros((B, cfg.total_anchors, 21))
lo = jax.jit(jax.grad(lossonly))
print(f"loss fwd+bwd:   {timeit_total(lo, (pd,), 20)*1e3:.2f} ms" if False else "", end="")
lo2 = jax.jit(lossonly)
print(f"loss fwd only:  {timeit_total(lo2, (pd, pl_), 20)*1e3:.2f} ms")

full = jax.jit(make_train_step(model, anchors, opt, augment=True))
def one(s):
    ns, m = full(s, {"image": jnp.asarray(batch["image"]), "boxes": boxes,
                     "labels": labels}, rng)
    return m["loss"]
print(f"full step:      {timeit_total(jax.jit(one), (state,), 10)*1e3:.2f} ms -> {B/timeit_total(jax.jit(one), (state,), 10):.0f} img/s")
