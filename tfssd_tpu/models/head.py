"""Multibox prediction heads.

Reference parity: models/header.py:get_head_from_outputs — per feature
map a 3x3 conv producing `boxes_per_cell * 4` localization channels and a
3x3 conv producing `boxes_per_cell * total_labels` class channels; each
reshaped to (B, n_priors_k, 4) / (B, n_priors_k, L) and concatenated over
maps (the reference's `HeadWrapper` layer does the reshape/concat).

TPU-first: the model emits *logits* — softmax is deferred to the decode
path so the loss consumes a fused log-softmax (ops/losses.py). Heads run
in the backbone compute dtype; outputs are cast to float32 so loss and
decode math is stable.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tfssd_tpu.config import SSDConfig

Array = jnp.ndarray


class MultiboxHead(nn.Module):
    """Per-map loc/cls convs + reshape/concat over feature maps."""

    config: SSDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]) -> Tuple[Array, Array]:
        cfg = self.config
        assert len(features) == len(cfg.feature_map_shapes), (
            [f.shape for f in features], cfg.feature_map_shapes)
        deltas, logits = [], []
        for k, (feat, bpc) in enumerate(zip(features, cfg.boxes_per_cell)):
            assert feat.shape[1] == cfg.feature_map_shapes[k], (
                k, feat.shape, cfg.feature_map_shapes[k])
            b = feat.shape[0]
            loc = nn.Conv(bpc * 4, (3, 3), dtype=self.dtype,
                          name=f"loc_{k}")(feat)
            cls = nn.Conv(bpc * cfg.total_labels, (3, 3), dtype=self.dtype,
                          name=f"cls_{k}")(feat)
            deltas.append(loc.reshape(b, -1, 4))
            logits.append(cls.reshape(b, -1, cfg.total_labels))
        pred_deltas = jnp.concatenate(deltas, axis=1).astype(jnp.float32)
        pred_logits = jnp.concatenate(logits, axis=1).astype(jnp.float32)
        assert pred_deltas.shape[1] == cfg.total_anchors
        return pred_deltas, pred_logits
