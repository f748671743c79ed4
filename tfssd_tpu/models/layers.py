"""Shared model building blocks (Flax linen).

Reference parity: the reference builds its trunks from stock
`keras.applications` layers (models/ssd_vgg16.py, models/ssd_mobilenet_v2.py);
here the equivalent blocks are written directly so the whole graph is a
single Flax module that jits/shards as one XLA program.

TPU-first notes:
  * NHWC layout throughout (XLA TPU's native conv layout).
  * Convs run in `dtype` (bfloat16 by default on TPU) with float32 params
    — the MXU consumes bf16 inputs at full throughput and XLA keeps the
    accumulation in fp32.
  * BatchNorm statistics are kept in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray
Dtype = Any


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> activation (MobileNetV2-style block unit)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    padding: str = "SAME"
    act: Optional[Callable[[Array], Array]] = nn.relu6
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99
    # Inference-only serving mode: the BN affine is pre-folded into the
    # conv weights (utils.fold_bn.fold_batch_norm), so the block is a
    # plain biased conv + activation and BN vanishes from the graph.
    fold_bn: bool = False

    # BN epsilon — must match utils.fold_bn.BN_EPSILON for the folded
    # weights to be exact.
    BN_EPSILON = 1e-3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.fold_bn and train:
            raise ValueError("fold_bn is an inference-only mode: there "
                             "are no batch statistics to update")
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=self.fold_bn,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.BN_EPSILON,
                dtype=jnp.float32,
                name="bn",
            )(x.astype(jnp.float32)).astype(self.dtype)
        if self.act is not None:
            x = self.act(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual: 1x1 expand -> 3x3 depthwise -> 1x1 project.

    Reference parity: the `keras.applications.MobileNetV2` blocks the
    reference taps (models/ssd_mobilenet_v2.py:get_model).
    """

    features: int        # output channels
    stride: int = 1
    expand_ratio: int = 6
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, (1, 1), dtype=self.dtype,
                       bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
                       name="expand")(y, train)
        y = ConvBN(
            hidden,
            (3, 3),
            strides=(self.stride, self.stride),
            groups=hidden,
            dtype=self.dtype,
            bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            name="depthwise",
        )(y, train)
        y = ConvBN(self.features, (1, 1), act=None, dtype=self.dtype,
                   bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
                   name="project")(y, train)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learnable per-channel scale.

    Reference parity: the conv4_3 L2-normalization with scale init 20 in
    models/ssd_vgg16.py (ParseNet-style; SSD paper §3.1).
    """

    scale_init: float = 20.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param(
            "gamma",
            lambda _, shape: jnp.full(shape, self.scale_init, jnp.float32),
            (x.shape[-1],),
        )
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-10)
        return ((xf / norm) * gamma).astype(x.dtype)


class ExtraFeatureBlock(nn.Module):
    """SSD extra feature block: 1x1 channel reduce -> 3x3 downsample conv.

    Reference parity: conv8_1/conv8_2 ... conv11_1/conv11_2 in
    models/ssd_vgg16.py and the analogous extra blocks in
    models/ssd_mobilenet_v2.py.
    """

    reduce_features: int
    features: int
    strides: Tuple[int, int] = (2, 2)
    padding: str = "SAME"       # "VALID" for the final 3x3->1x1 stages
    use_bn: bool = False        # MBv2 extras use BN; VGG extras use bias+relu
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.use_bn:
            x = ConvBN(self.reduce_features, (1, 1), act=nn.relu6,
                       dtype=self.dtype, bn_momentum=self.bn_momentum,
                       fold_bn=self.fold_bn, name="reduce")(x, train)
            x = ConvBN(self.features, (3, 3), strides=self.strides,
                       padding=self.padding, act=nn.relu6,
                       dtype=self.dtype, bn_momentum=self.bn_momentum,
                       fold_bn=self.fold_bn, name="down")(x, train)
        else:
            x = nn.relu(nn.Conv(self.reduce_features, (1, 1),
                                dtype=self.dtype, name="reduce")(x))
            x = nn.relu(nn.Conv(self.features, (3, 3), strides=self.strides,
                                padding=self.padding, dtype=self.dtype,
                                name="down")(x))
        return x
