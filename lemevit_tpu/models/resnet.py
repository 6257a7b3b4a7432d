"""ResNet feature-pyramid backbone (NHWC flax).

Capability parity with the reference CD vertical's vendored resnet
(change_detection/models/resnet.py, networks.py:331-371 backbone choices
resnet/swin/lemevit): provides resnet18/34/50 with features_only semantics
matching LeMeViT's (stride-4/8/16/32 NHWC pyramid). Original implementation.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.core.layers import torch_conv_init

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=torch_conv_init())
        identity = x
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=1, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = bn(name="bn2")(y)
        if identity.shape != y.shape:
            identity = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="down_conv")(x)
            identity = bn(name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=torch_conv_init())
        identity = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3),
                 strides=(self.stride, self.stride), padding=1,
                 name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if identity.shape != y.shape:
            identity = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="down_conv")(x)
            identity = bn(name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """features_only ResNet: returns [C2, C3, C4, C5] NHWC maps."""

    block: Callable = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    features_only: bool = True
    num_classes: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=torch_conv_init(),
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, n_blocks in enumerate(self.layers):
            features = self.width * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(features, stride, dtype=self.dtype,
                               name=f"layer{i + 1}_{j}")(x, train=train)
            feats.append(x)
        if self.features_only:
            return feats
        x = x.mean(axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="fc")(x)


def resnet18(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)
