"""The SSD detector module: backbone -> multibox heads.

Reference parity: models/ssd_vgg16.py + models/ssd_mobilenet_v2.py
`get_model(hyper_params)` / `init_model(model)` — but as one Flax module
whose apply is a pure function of (params, batch_stats, images), so the
whole forward (trunk, extras, heads) is a single XLA program that jits
and shards with no Python in the hot path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfssd_tpu.config import SSDConfig
from tfssd_tpu.models.head import MultiboxHead
from tfssd_tpu.models.mobilenet_v2 import MobileNetV2Backbone
from tfssd_tpu.models.vgg16 import VGG16Backbone

Array = jnp.ndarray


class SSD(nn.Module):
    """Full detector. __call__(images (B,H,W,3)) -> (deltas (B,N,4),
    logits (B,N,L))."""

    config: SSDConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False
                 ) -> Tuple[Array, Array]:
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.backbone == "mobilenet_v2":
            backbone_cls = MobileNetV2Backbone
            kwargs = dict(dtype=dtype, bn_momentum=cfg.bn_momentum,
                          fold_bn=cfg.fold_bn)
        elif cfg.backbone == "vgg16":
            backbone_cls = VGG16Backbone
            kwargs = dict(dtype=dtype, ssd512=cfg.img_size == 512)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")
        if cfg.remat:
            # Rematerialize trunk activations in the backward pass
            # (jax.checkpoint): larger per-chip batches for ~30% extra
            # forward FLOPs. Param names are unchanged, so checkpoints
            # port between remat settings.
            backbone_cls = nn.remat(backbone_cls, static_argnums=(2,))
        features = backbone_cls(**kwargs, name="backbone")(images, train)
        return MultiboxHead(cfg, dtype=dtype, name="head")(features)


def get_model(config: SSDConfig) -> SSD:
    """Mirror of reference `get_model(hyper_params)`."""
    return SSD(config)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _init_variables(model: SSD, rng: jax.Array, batch_size: int):
    """Module-level jitted init: Flax modules hash by their dataclass
    fields, so same-config inits reuse the compiled executable instead of
    recompiling a fresh closure per call (~54s on CPU per recompile)."""
    cfg = model.config
    dummy = jnp.zeros((batch_size, cfg.img_size, cfg.img_size, 3),
                      jnp.float32)
    return model.init(rng, dummy, train=False)


def init_model(model: SSD, rng: jax.Array, batch_size: int = 1):
    """Mirror of reference `init_model(model)` — dummy forward to build
    shapes. Returns the full variable collection ({'params', 'batch_stats'}).

    The init runs under jit: eager `model.init` dispatches thousands of
    tiny param-init ops one by one, which costs minutes over a remote
    device transport (measured 277s on the axon TPU tunnel vs ~3s jitted)."""
    return _init_variables(model, rng, batch_size)
