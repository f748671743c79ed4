import time, glob, gzip, json, os
import jax, jax.numpy as jnp, numpy as np
from tfssd_tpu import get_hyper_params
from tfssd_tpu.models import get_model, init_model, make_predict_fn
from tfssd_tpu.ops.boxes import generate_anchors

cfg = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16")
model = get_model(cfg)
variables = init_model(model, jax.random.key(0))
anchors = generate_anchors(cfg)
predict = jax.jit(make_predict_fn(model, anchors, cfg))
B = 256
images = jnp.asarray(np.random.default_rng(0).uniform(-1,1,(B,cfg.img_size,cfg.img_size,3)), jnp.float32)
for _ in range(3): jax.block_until_ready(predict(variables, images))
os.makedirs("/tmp/trace", exist_ok=True)
with jax.profiler.trace("/tmp/trace"):
    outs = [predict(variables, images) for _ in range(5)]
    jax.block_until_ready(outs)
print("trace files:", glob.glob("/tmp/trace/**/*.trace.json.gz", recursive=True) + glob.glob("/tmp/trace/**/*.xplane.pb", recursive=True))
