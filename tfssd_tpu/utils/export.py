"""Ahead-of-time model export for serving.

Reference parity: the reference's deployable artifact is the Keras
weights file (`trained/ssd_{backbone}_model_weights.h5`, trainer.py
`ModelCheckpoint`), which still requires the full Python model code to
serve. The TPU-native artifact is stronger: `jax.export` serializes the
ENTIRE jitted predict function (forward + decode + NMS, weights baked in
as constants) as versioned StableHLO — no model code, no flax, no
weights file — and the same artifact lowers for both CPU and TPU.

Serving dependency, precisely: deserialization must reconstruct the
output pytree, whose treedef names `tfssd_tpu.ops.nms.NMSResult` — so a
serving process either imports this module (which pulls only
jax/numpy-level deps, not flax) or registers its own 4-field namedtuple
under the same serialized name:

    from typing import NamedTuple
    import jax.numpy as jnp
    from jax import export as jax_export
    class NMSResult(NamedTuple):
        boxes: jnp.ndarray; scores: jnp.ndarray
        classes: jnp.ndarray; valid: jnp.ndarray
    jax_export.register_namedtuple_serialization(
        NMSResult, serialized_name="tfssd_tpu.ops.nms.NMSResult")

With that registration, serving truly needs jax alone.

Usage:
    from tfssd_tpu.utils.export import export_predict, load_exported
    blob = export_predict(model, anchors, cfg, variables, batch_size=8)
    open("ssd.stablehlo", "wb").write(blob)
    ...
    serve = load_exported(open("ssd.stablehlo", "rb").read())
    result = serve(images)   # NmsResult-shaped (boxes, scores, classes, valid)

predictor.py exposes this as `--export PATH`.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from tfssd_tpu.ops.nms import NMSResult

# The artifact's output pytree (NMSResult namedtuple) must have a stable
# serialized name so deserializing processes reconstruct the same type.
jax_export.register_namedtuple_serialization(
    NMSResult, serialized_name="tfssd_tpu.ops.nms.NMSResult")


def export_predict(model, anchors, cfg, variables, batch_size: int,
                   platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Serialize the full predict path (weights baked in) to bytes.

    The exported function takes ONE argument: a float32
    (batch_size, img_size, img_size, 3) image batch already preprocessed
    to [-1, 1] (`train.preprocess_images`), and returns the decode+NMS
    output. Multi-platform lowering works because the whole path is pure
    XLA (no platform-specific custom calls).
    """
    from tfssd_tpu.models import make_predict_fn

    predict = make_predict_fn(model, anchors, cfg)

    def serve(images):
        return predict(variables, images)

    spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.img_size, cfg.img_size, 3), jnp.float32)
    exported = jax_export.export(
        jax.jit(serve), platforms=tuple(platforms))(spec)
    return bytes(exported.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an export_predict artifact into a callable.

    The callable runs on whatever platform jax is currently using
    (among those the artifact was exported for).
    """
    exported = jax_export.deserialize(blob)
    return exported.call
