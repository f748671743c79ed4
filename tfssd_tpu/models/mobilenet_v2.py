"""MobileNetV2 SSD backbone (Flax).

Reference parity: models/ssd_mobilenet_v2.py:get_model — taps the
`keras.applications.MobileNetV2` trunk at the stride-16 expansion relu
(19x19 for 300 input) and the final 10x10 feature, then adds 4 extra
feature blocks down to 1x1, giving feature maps 19/10/5/3/2/1.

This is a from-scratch Flax implementation of the same trunk (Sandler et
al., MobileNetV2, arXiv:1801.04381): alpha=1.0, the standard
(t, c, n, s) schedule. The first SSD tap is the *expansion* activation of
block 13 (the 576-channel relu6 before its stride-2 depthwise), exactly
where Keras' `block_13_expand_relu` sits; the second tap is the 1280-wide
final conv output.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tfssd_tpu.models.layers import ConvBN, ExtraFeatureBlock, InvertedResidual

Array = jnp.ndarray

# (expand_ratio t, channels c, repeats n, first stride s) — MBv2 paper Table 2.
_MBV2_SCHEDULE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),   # block 13 starts this group; its expansion is tap #1
    (6, 320, 1, 1),
)


class MobileNetV2Backbone(nn.Module):
    """Trunk + SSD extras -> list of 6 feature maps (19/10/5/3/2/1 @300)."""

    dtype: Any = jnp.float32
    bn_momentum: float = 0.99
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        bn = self.bn_momentum
        fold = self.fold_bn
        x = x.astype(self.dtype)
        x = ConvBN(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                   bn_momentum=bn, fold_bn=fold, name="stem")(x, train)

        taps: List[Array] = []
        block_idx = 0
        for t, c, n, s in _MBV2_SCHEDULE:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2 and c == 160:
                    # Tap #1: expansion relu of the first stride-2 block of
                    # the 160-channel group (Keras block_13_expand_relu,
                    # 19x19x576 at 300 input). Run the expansion here so the
                    # tap can be captured, then the rest of the block.
                    hidden = x.shape[-1] * t
                    y = ConvBN(hidden, (1, 1), dtype=self.dtype,
                               bn_momentum=bn, fold_bn=fold,
                               name=f"block{block_idx}_expand")(x, train)
                    taps.append(y)
                    y = ConvBN(hidden, (3, 3), strides=(2, 2), groups=hidden,
                               dtype=self.dtype, bn_momentum=bn,
                               fold_bn=fold,
                               name=f"block{block_idx}_depthwise")(y, train)
                    x = ConvBN(c, (1, 1), act=None, dtype=self.dtype,
                               bn_momentum=bn, fold_bn=fold,
                               name=f"block{block_idx}_project")(y, train)
                else:
                    x = InvertedResidual(
                        c, stride=stride, expand_ratio=t, dtype=self.dtype,
                        bn_momentum=bn, fold_bn=fold,
                        name=f"block{block_idx}",
                    )(x, train)
                block_idx += 1

        # Final 1x1 conv to 1280 (Keras out_relu), tap #2: 10x10x1280.
        x = ConvBN(1280, (1, 1), dtype=self.dtype, bn_momentum=bn,
                   fold_bn=fold, name="head_conv")(x, train)
        taps.append(x)

        # SSD extra feature blocks (reference ssd_mobilenet_v2.py extras):
        # 10 -> 5 -> 3 -> 2 -> 1 with SAME-padded stride-2 3x3 convs.
        extras: Tuple[Tuple[int, int], ...] = (
            (256, 512), (128, 256), (128, 256), (64, 128))
        for j, (r, f) in enumerate(extras):
            x = ExtraFeatureBlock(r, f, use_bn=True, dtype=self.dtype,
                                  bn_momentum=bn, fold_bn=fold,
                                  name=f"extra{j}")(x, train)
            taps.append(x)
        return taps
