"""Fold inference-mode BatchNorm into conv weights at load time.

Reference parity: none — the reference serves Keras BN layers as-is.
This is the rebuild's serving optimization (VERDICT r4 next #5): at
inference BN is exactly the per-channel affine
    y = (conv(x) - mean) * gamma / sqrt(var + eps) + beta
so with s = gamma / sqrt(var + eps) it equals a conv with kernel * s and
bias beta - mean * s. `fold_batch_norm` rewrites a trained variable
collection into the parameter tree of the same model built with
`SSDConfig.fold_bn=True` (ConvBN -> plain biased conv). Folding is done
in float32 on the float32 master params, so it is exact in f32 mode;
in bf16 compute the only difference is where the single rounding to
bf16 happens.

Unlike `--export`'s StableHLO constant-folding, the folded weights stay
RUNTIME buffers: a new checkpoint can be folded and swapped in without
recompiling the serving function.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from tfssd_tpu.models.layers import ConvBN

BN_EPSILON = ConvBN.BN_EPSILON


def fold_for_serving(config, variables):
    """(config, variables) -> (folded config, model, folded variables)
    for serving, preserving every other config override
    (dataclasses.replace, NOT a fresh get_hyper_params — rebuilding
    from the backbone name silently dropped overrides like
    compute_dtype). No-op passthrough for BN-free models (empty
    batch_stats) or when the config is already folded."""
    from tfssd_tpu.models import get_model

    if config.fold_bn or not variables.get("batch_stats"):
        return config, get_model(config), variables
    cfg = dataclasses.replace(config, fold_bn=True).validate()
    return cfg, get_model(cfg), fold_batch_norm(variables)


def fold_batch_norm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """variables {'params', 'batch_stats'} of a fold_bn=False model ->
    {'params'} for the SAME config with fold_bn=True.

    Walks the tree; every subtree shaped like a ConvBN block
    ({'conv': {'kernel'}, 'bn': {'scale', 'bias'}} with matching
    batch_stats {'bn': {'mean', 'var'}}) is replaced by
    {'conv': {'kernel': k*s, 'bias': beta - mean*s}}. Everything else
    (bias convs, L2Norm, heads) passes through untouched.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        out = {}
        for key, val in p.items():
            if (isinstance(val, dict) and "conv" in val and "bn" in val
                    and "kernel" in val.get("conv", {})):
                # a ConvBN block: exact {conv, bn} pair by construction
                kernel = jnp.asarray(val["conv"]["kernel"], jnp.float32)
                gamma = jnp.asarray(val["bn"]["scale"], jnp.float32)
                beta = jnp.asarray(val["bn"]["bias"], jnp.float32)
                bn_stats = s[key]["bn"]
                mean = jnp.asarray(bn_stats["mean"], jnp.float32)
                var = jnp.asarray(bn_stats["var"], jnp.float32)
                scale = gamma / jnp.sqrt(var + BN_EPSILON)
                out[key] = {"conv": {
                    # kernel (kh, kw, in/groups, out): scale broadcasts
                    # over the output-channel (last) axis
                    "kernel": kernel * scale,
                    "bias": beta - mean * scale,
                }}
            elif isinstance(val, dict):
                out[key] = walk(val, s.get(key, {}) if isinstance(s, dict)
                                else {})
            else:
                out[key] = val
        return out

    return {"params": walk(params, stats)}
