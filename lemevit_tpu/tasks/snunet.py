"""SNUNet-ECAM change detection (nested-UNet Siamese + ensemble channel
attention), the reference's alternative CD head
(change_detection/models/Models.py:63-223). Original NHWC flax
implementation of the same architecture family.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.tasks.upernet import resize

Dtype = Any


class ConvBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class ChannelAttention(nn.Module):
    """ECAM channel attention: avg+max pooled MLP gate."""

    channels: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(self.channels // self.ratio, 1)
        mlp1 = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="fc1")
        mlp2 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")
        avg = mlp2(nn.relu(mlp1(x.mean(axis=(1, 2), keepdims=True))))
        mx = mlp2(nn.relu(mlp1(x.max(axis=(1, 2), keepdims=True))))
        return jax.nn.sigmoid(avg + mx)


class SNUNetECAM(nn.Module):
    """Siamese nested UNet with ensemble channel attention.

    Depth-4 UNet++ over concatenated bitemporal features; the four
    full-resolution decoder outputs are ensembled through channel attention
    (intra-group + overall), then classified.
    """

    base_channels: int = 32
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, *, train: bool = False):
        c = self.base_channels
        chans = [c, c * 2, c * 4, c * 8, c * 16]
        enc = [ConvBlock(ch, dtype=self.dtype, name=f"enc{i}")
               for i, ch in enumerate(chans)]

        def down(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        # Siamese encoders (shared weights: same modules applied twice)
        feats1, feats2 = [], []
        x1, x2 = img1, img2
        for i, blk in enumerate(enc):
            if i > 0:
                x1, x2 = down(x1), down(x2)
            x1 = blk(x1, train=train)
            x2 = blk(x2, train=train)
            feats1.append(x1)
            feats2.append(x2)

        # nested decoder on concat(bitemporal) skip connections
        # x[i][j]: node at depth i, stage j (UNet++ grid)
        grid = {}
        for i in range(5):
            grid[(i, 0)] = jnp.concatenate([feats1[i], feats2[i]], axis=-1)
        for j in range(1, 5):
            for i in range(0, 5 - j):
                ups = resize(grid[(i + 1, j - 1)],
                             grid[(i, 0)].shape[1:3])
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [ups], axis=-1)
                grid[(i, j)] = ConvBlock(chans[i], dtype=self.dtype,
                                         name=f"dec{i}_{j}")(cat, train=train)

        outs = [grid[(0, j)] for j in range(1, 5)]  # 4 outputs at full res
        stacked = jnp.concatenate(outs, axis=-1)    # (B,H,W,4c)
        # intra-group attention: mean of the 4 outputs gated together
        intra = sum(outs) / 4.0
        ca_intra = ChannelAttention(c, ratio=4, dtype=self.dtype,
                                    name="ca_intra")(intra)
        ca_all = ChannelAttention(4 * c, dtype=self.dtype,
                                  name="ca_all")(stacked)
        gated = stacked * ca_all + jnp.tile(ca_intra, (1, 1, 1, 4)) * stacked
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="head")(gated)
