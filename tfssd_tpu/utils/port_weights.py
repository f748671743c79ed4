"""Port Keras/TF weights (the reference's format) into Flax param trees.

Reference parity: the reference initializes its backbones from
`keras.applications` ImageNet weights and saves trained models as Keras
h5 (`trained/ssd_{backbone}_model_weights.h5`, io_utils.get_model_path).
A user migrating from the reference brings those weights; this module
maps them onto tfssd_tpu's Flax modules:

  * keras.applications.MobileNetV2 trunk -> models.mobilenet_v2 names
  * keras.applications.VGG16 conv trunk  -> models.vgg16 names

Layout notes: Keras Conv2D kernels are HWIO, same as Flax. Keras
DepthwiseConv2D kernels are (H, W, Cin, mult=1) and Flax grouped convs
expect (H, W, 1, Cout) — transposed here. BatchNorm gamma/beta/
moving_mean/moving_variance map to scale/bias/mean/var.

These mappers double as the graph-parity proof: tests build a randomly
initialized Keras trunk, port it, and assert the Flax forward reproduces
the Keras feature maps at the SSD tap points.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# MobileNetV2 block schedule (t, c, n, s) — must match models/mobilenet_v2.py.
_MBV2_SCHEDULE = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
)


def _conv_bn(weights: Dict[str, np.ndarray], conv_name: str, bn_name: str,
             depthwise: bool = False) -> Dict:
    """One ConvBN flax subtree from Keras layer weight dicts."""
    kernel = weights[f"{conv_name}/kernel"]
    if depthwise:
        kernel = np.transpose(kernel, (0, 1, 3, 2))  # (H,W,Cin,1)->(H,W,1,Cin)
    return {
        "params": {"conv": {"kernel": kernel},
                   "bn": {"scale": weights[f"{bn_name}/gamma"],
                          "bias": weights[f"{bn_name}/beta"]}},
        "batch_stats": {"bn": {"mean": weights[f"{bn_name}/moving_mean"],
                               "var": weights[f"{bn_name}/moving_variance"]}},
    }


def _merge(dst: Dict, name: str, sub: Dict) -> None:
    dst.setdefault("params", {})[name] = sub["params"]
    dst.setdefault("batch_stats", {})[name] = sub["batch_stats"]


def keras_model_weights(model) -> Dict[str, np.ndarray]:
    """Flatten a Keras model to {layer_name/weight_name: array}."""
    out = {}
    for layer in model.layers:
        for w in layer.weights:
            # w.name like "block_1_expand/kernel:0" (or path-style in K3)
            name = w.name.split(":")[0]
            if "/" not in name:
                name = f"{layer.name}/{name}"
            out[name] = np.asarray(w)
    return out


def port_mobilenet_v2(weights: Dict[str, np.ndarray]) -> Dict:
    """Keras MobileNetV2 trunk -> {'params', 'batch_stats'} subtree for
    models.mobilenet_v2.MobileNetV2Backbone (trunk + head_conv only;
    SSD extras are not in the Keras model)."""
    tree: Dict = {"params": {}, "batch_stats": {}}
    _merge(tree, "stem", _conv_bn(weights, "Conv1", "bn_Conv1"))

    block_idx = 0
    keras_idx = 0
    for t, c, n, s in _MBV2_SCHEDULE:
        for i in range(n):
            stride = s if i == 0 else 1
            if keras_idx == 0:
                # Keras "expanded_conv": no expand conv (t=1)
                sub = {"params": {}, "batch_stats": {}}
                dw = _conv_bn(weights, "expanded_conv_depthwise",
                              "expanded_conv_depthwise_BN", depthwise=True)
                pj = _conv_bn(weights, "expanded_conv_project",
                              "expanded_conv_project_BN")
                _merge(sub, "depthwise", dw)
                _merge(sub, "project", pj)
                tree["params"][f"block{block_idx}"] = sub["params"]
                tree["batch_stats"][f"block{block_idx}"] = sub["batch_stats"]
            else:
                kp = f"block_{keras_idx}"
                ex = _conv_bn(weights, f"{kp}_expand", f"{kp}_expand_BN")
                dw = _conv_bn(weights, f"{kp}_depthwise",
                              f"{kp}_depthwise_BN", depthwise=True)
                pj = _conv_bn(weights, f"{kp}_project", f"{kp}_project_BN")
                if stride == 2 and c == 160:
                    # The tap block is flattened in our module
                    # (block{idx}_expand / _depthwise / _project).
                    _merge(tree, f"block{block_idx}_expand", ex)
                    _merge(tree, f"block{block_idx}_depthwise", dw)
                    _merge(tree, f"block{block_idx}_project", pj)
                else:
                    sub = {"params": {}, "batch_stats": {}}
                    _merge(sub, "expand", ex)
                    _merge(sub, "depthwise", dw)
                    _merge(sub, "project", pj)
                    tree["params"][f"block{block_idx}"] = sub["params"]
                    tree["batch_stats"][f"block{block_idx}"] = sub["batch_stats"]
            block_idx += 1
            keras_idx += 1

    _merge(tree, "head_conv", _conv_bn(weights, "Conv_1", "Conv_1_bn"))
    return tree


def port_vgg16(weights: Dict[str, np.ndarray]) -> Dict:
    """Keras VGG16 conv trunk -> params subtree for
    models.vgg16.VGG16Backbone (conv1_1 .. conv5_3; fc6/fc7/extras/L2Norm
    are SSD additions with no Keras counterpart)."""
    params: Dict = {}
    counts = (2, 2, 3, 3, 3)
    for b, n in enumerate(counts, start=1):
        for i in range(1, n + 1):
            k = f"block{b}_conv{i}"
            params[f"conv{b}_{i}"] = {
                "kernel": weights[f"{k}/kernel"],
                "bias": weights[f"{k}/bias"],
            }
    return {"params": params}


def graft(variables: Dict, backbone_tree: Dict,
          backbone_name: str = "backbone") -> Dict:
    """Return a copy of a full model variable collection with the ported
    backbone subtree grafted in (partial update: only ported leaves are
    replaced; SSD heads/extras keep their initialization)."""
    import jax

    def deep_update(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                raise KeyError(
                    f"ported weight {path}/{k} has no destination in the "
                    f"model (wrong backbone for this weight tree?)")
            if isinstance(v, dict):
                if not isinstance(out[k], dict):
                    raise KeyError(
                        f"ported subtree {path}/{k} maps onto a leaf")
                out[k] = deep_update(out[k], v, f"{path}/{k}")
            else:
                if v.shape != out[k].shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: ported {v.shape} "
                        f"vs model {out[k].shape}")
                out[k] = jax.numpy.asarray(v)
        return out

    new_vars = {k: dict(v) for k, v in variables.items()}
    for coll in ("params", "batch_stats"):
        if coll in backbone_tree and backbone_tree[coll]:
            sub = variables[coll][backbone_name]
            new_vars[coll] = dict(variables[coll])
            new_vars[coll][backbone_name] = deep_update(
                sub, backbone_tree[coll])
    return new_vars


def port_h5_into_variables(variables: Dict, backbone: str,
                           h5_path: str) -> Dict:
    """Shared --port-h5 path for predictor.py AND trainer.py: load a Keras
    h5 (reference `trained/ssd_*_model_weights.h5` format or a
    keras.applications trunk), port the backbone subtree, graft it into
    `variables` (a {"params": ..., "batch_stats": ...} collection).

    Reference parity: the reference's accuracy rests on keras.applications
    ImageNet trunk initialization (SURVEY.md §2 #3/#4, §7 hard parts);
    this is the fine-tune-from-ported-trunk entry for both CLIs.
    """
    weights = load_keras_h5(h5_path)
    porter = port_mobilenet_v2 if backbone == "mobilenet_v2" else port_vgg16
    return graft(variables, porter(weights))


def load_keras_h5(path: str):
    """Load a Keras h5/keras file (reference checkpoint format) and return
    its flattened weights. Requires TensorFlow."""
    import tensorflow as tf  # local import: TF only needed for porting

    model = tf.keras.models.load_model(path, compile=False)
    return keras_model_weights(model)
