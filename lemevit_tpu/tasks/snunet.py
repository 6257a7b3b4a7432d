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


def _siamese_encode(enc, img1, img2, train):
    """Run the shared-weight encoder stack on both images, pooling
    between stages; returns the per-stage (pre-pool) feature lists."""
    def down(x):
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    feats1, feats2 = [], []
    x1, x2 = img1, img2
    for i, blk in enumerate(enc):
        if i > 0:
            x1, x2 = down(x1), down(x2)
        x1 = blk(x1, train=train)
        x2 = blk(x2, train=train)
        feats1.append(x1)
        feats2.append(x2)
    return feats1, feats2


def _nested_grid(feats1, feats2, chans, dtype, train):
    """UNet++ decoder grid shared by SNUNet_ECAM / Siam_NestedUNet_Conc
    (reference Models.py:63-223 / 226-314): node (i,j) convs the concat
    of [A_i, B_i, nodes (i,1..j-1), up(next-depth node)]. At j==1 the
    upsampled operand is the B-branch encoder feature alone
    (Up{i+1}_0(x{i+1}_0B)) — conv{i}_1 in-channels are
    filters[i]*2 + filters[i+1]. Learnable 2x ConvTranspose ups are
    replaced by parameter-free bilinear resize (TPU-friendly; same
    function family once followed by the node's 3x3 convs)."""
    grid = {}
    for i in range(len(chans)):
        grid[(i, 0)] = jnp.concatenate([feats1[i], feats2[i]], axis=-1)
    depth = len(chans)
    for j in range(1, depth):
        for i in range(0, depth - j):
            src = feats2[i + 1] if j == 1 else grid[(i + 1, j - 1)]
            ups = resize(src, grid[(i, 0)].shape[1:3])
            cat = jnp.concatenate(
                [grid[(i, k)] for k in range(j)] + [ups], axis=-1)
            grid[(i, j)] = ConvBlock(chans[i], dtype=dtype,
                                     name=f"dec{i}_{j}")(cat, train=train)
    return grid


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
        feats1, feats2 = _siamese_encode(enc, img1, img2, train)
        grid = _nested_grid(feats1, feats2, chans, self.dtype, train)

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


class SiamNestedUNetConc(nn.Module):
    """SNUNet-CD WITHOUT attention (the reference's Siam_NestedUNet_Conc,
    change_detection/models/Models.py:226-314): the same Siamese UNet++
    grid, but the four full-resolution decoder outputs go through four
    1x1 classifiers whose concatenated logits feed a final 1x1 conv.
    Returns (out1, out2, out3, out4, out) — hybrid_loss sums over the
    tuple, matching the reference's deep supervision."""

    base_channels: int = 32
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, *, train: bool = False):
        c = self.base_channels
        chans = [c, c * 2, c * 4, c * 8, c * 16]
        enc = [ConvBlock(ch, dtype=self.dtype, name=f"enc{i}")
               for i, ch in enumerate(chans)]
        feats1, feats2 = _siamese_encode(enc, img1, img2, train)
        grid = _nested_grid(feats1, feats2, chans, self.dtype, train)

        heads = [nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name=f"final{j}")(grid[(0, j)])
                 for j in range(1, 5)]
        out = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="conv_final")(jnp.concatenate(heads, axis=-1))
        return (*heads, out)


class _DiffConvStage(nn.Module):
    """Encoder stage of SiamUnet_diff: n 3x3 conv+BN+ReLU+dropout."""

    features: int
    n_convs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.n_convs):
            x = nn.Conv(self.features, (3, 3), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.2, deterministic=not train,
                           name=f"do{i}")(x)
        return x


class SiamUnetDiff(nn.Module):
    """Fully convolutional Siamese-difference network (Daudt et al.,
    ICIP'18) — the reference's change_detection/models/siamunet_dif.py:
    a 4-stage shared-weight encoder on each image; the decoder upsamples
    and concatenates with |skip_1 - skip_2| at every scale. Decoder
    stride-1 "deconvs" are implemented as 3x3 convs (a stride-1
    transposed conv spans the same function family); the 2x upsamplers
    are ConvTranspose stride 2, matching the reference's
    kernel 3 / output_padding 1 geometry."""

    base_channels: int = 16
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, *, train: bool = False):
        c = self.base_channels
        chans = [c, c * 2, c * 4, c * 8]
        n_convs = [2, 2, 3, 3]
        stages = [_DiffConvStage(ch, nc, dtype=self.dtype, name=f"enc{i}")
                  for i, (ch, nc) in enumerate(zip(chans, n_convs))]

        def encode(x):
            skips = []
            for i, st in enumerate(stages):
                x = st(x, train=train)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return x, skips

        _, skips1 = encode(img1)
        x2p, skips2 = encode(img2)

        x = x2p  # reference decodes from the second image's pool4
        dec_convs = [[chans[3], chans[3], chans[2]],
                     [chans[2], chans[2], chans[1]],
                     [chans[1], chans[0]],
                     [chans[0], self.num_classes]]
        for d, outs in enumerate(dec_convs):
            lvl = 3 - d
            x = nn.ConvTranspose(x.shape[-1], (3, 3), strides=(2, 2),
                                 dtype=self.dtype, name=f"up{lvl}")(x)
            skip = jnp.abs(skips1[lvl].astype(jnp.float32)
                           - skips2[lvl].astype(jnp.float32)).astype(
                               self.dtype)
            x = resize(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
            for i, ch in enumerate(outs):
                last = (d == 3 and i == len(outs) - 1)
                x = nn.Conv(ch, (3, 3), padding=1,
                            dtype=jnp.float32 if last else self.dtype,
                            name=f"dec{lvl}_{i}")(x)
                if last:
                    break
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name=f"dbn{lvl}_{i}")(x)
                x = nn.relu(x)
                x = nn.Dropout(0.2, deterministic=not train,
                               name=f"ddo{lvl}_{i}")(x)
        return (x,)
