"""VGG16 SSD backbone with atrous fc6/fc7 (Flax).

Reference parity: models/ssd_vgg16.py:get_model — Keras VGG16 truncated
after conv5_3, pool5 changed to 3x3 stride 1, fc6 -> Conv2D(1024, 3x3,
dilation_rate=6), fc7 -> Conv2D(1024, 1x1), conv4_3 L2-normalized with a
learnable scale (init 20), extra feature layers conv8..conv11 producing
6 maps (38/19/10/5/3/1 at 300 input). The SSD512 variant extends with a
7th map (64/32/16/8/4/2/1) using SAME-padded stride-2 extras.

TPU-first: plain convs (no BN, matching the original VGG-SSD), bf16
compute option, NHWC, ceil-mode pooling expressed as SAME padding.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp

from tfssd_tpu.models.layers import ExtraFeatureBlock, L2Norm

Array = jnp.ndarray


def _conv_group(x: Array, features: int, count: int, prefix: str,
                dtype: Any) -> Array:
    for i in range(count):
        x = nn.relu(nn.Conv(features, (3, 3), dtype=dtype,
                            name=f"{prefix}_{i + 1}")(x))
    return x


def _pool(x: Array) -> Array:
    # SAME padding == TF's ceil-mode pooling: 75 -> 38 (reference pool3).
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


class VGG16Backbone(nn.Module):
    """VGG16-SSD trunk + extras -> 6 (SSD300) or 7 (SSD512) feature maps."""

    dtype: Any = jnp.float32
    ssd512: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        del train  # no batch statistics in the VGG trunk
        x = x.astype(self.dtype)
        x = _conv_group(x, 64, 2, "conv1", self.dtype)
        x = _pool(x)
        x = _conv_group(x, 128, 2, "conv2", self.dtype)
        x = _pool(x)
        x = _conv_group(x, 256, 3, "conv3", self.dtype)
        x = _pool(x)
        x = _conv_group(x, 512, 3, "conv4", self.dtype)
        conv4_3 = L2Norm(scale_init=20.0, name="conv4_3_norm")(x)
        taps: List[Array] = [conv4_3]
        x = _pool(x)
        x = _conv_group(x, 512, 3, "conv5", self.dtype)
        # pool5: 3x3 stride 1 (keeps 19x19) — reference ssd_vgg16.py.
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        # Atrous fc6 + fc7 (reference: Conv2D(1024, 3, dilation_rate=6)).
        x = nn.relu(nn.Conv(1024, (3, 3), kernel_dilation=(6, 6),
                            dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x))
        taps.append(x)

        if not self.ssd512:
            # SSD300 extras: 19->10 (SAME s2), 10->5 (SAME s2),
            # 5->3 (VALID s1), 3->1 (VALID s1).
            specs = (
                (256, 512, (2, 2), "SAME"),
                (128, 256, (2, 2), "SAME"),
                (128, 256, (1, 1), "VALID"),
                (128, 256, (1, 1), "VALID"),
            )
        else:
            # SSD512 extras: 32->16->8->4->2->1, all SAME stride 2.
            specs = (
                (256, 512, (2, 2), "SAME"),
                (128, 256, (2, 2), "SAME"),
                (128, 256, (2, 2), "SAME"),
                (128, 256, (2, 2), "SAME"),
                (128, 256, (2, 2), "SAME"),
            )
        for j, (r, f, s, p) in enumerate(specs):
            x = ExtraFeatureBlock(r, f, strides=s, padding=p, use_bn=False,
                                  dtype=self.dtype, name=f"conv{8 + j}")(x)
            taps.append(x)
        return taps
