"""UperNet semantic segmentation head + slide inference.

Equivalent surface to the reference's mmseg configs
(semantic_segmentation/configs/_base_/models/upernet_lemevit_tiny.py:1-53):
EncoderDecoder = LeMeViT feature pyramid -> UPerHead (PPM pool scales
1/2/3/6, 512 channels) + auxiliary FCNHead on stage-3, slide inference with
512^2 crops / 384 stride. All NHWC, bilinear resizes via jax.image.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.core.layers import torch_conv_init

Dtype = Any


def resize(x: jax.Array, size: Tuple[int, int],
           method: str = "bilinear") -> jax.Array:
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    return jax.image.resize(x, (b, size[0], size[1], c), method=method)


class ConvModule(nn.Module):
    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features,
                    (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2,
                    use_bias=False,
                    kernel_init=torch_conv_init(),
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch-style adaptive average pool on NHWC: output bin i averages input
    rows [floor(i*H/s), ceil((i+1)*H/s)); works for output larger than input
    too. Expressed as two small mask matmuls (MXU-friendly)."""
    b, h, w, c = x.shape
    sh, sw = out_hw

    def mask(n_in, n_out):
        i = jnp.arange(n_out)[:, None]
        j = jnp.arange(n_in)[None, :]
        lo = jnp.floor(i * n_in / n_out)
        hi = jnp.ceil((i + 1) * n_in / n_out)
        m = ((j >= lo) & (j < hi)).astype(x.dtype)
        return m / jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)

    mh = mask(h, sh)   # (sh, h)
    mw = mask(w, sw)   # (sw, w)
    out = jnp.einsum("ph,bhwc->bpwc", mh, x)
    return jnp.einsum("qw,bpwc->bpqc", mw, out)


class PPM(nn.Module):
    """Pyramid pooling: adaptive-avg-pool to each scale, 1x1 conv, upsample."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        outs = []
        for i, s in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool(x, (s, s))
            pooled = ConvModule(self.channels, 1, dtype=self.dtype,
                                name=f"pool{i}")(pooled, train=train)
            outs.append(resize(pooled, (h, w)))
        return outs


class UPerHead(nn.Module):
    """FPN-style fusion of the 4-level pyramid + PPM on the top level."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], *, train: bool = False):
        # PPM on the deepest feature
        top = feats[-1]
        ppm_outs = [top] + PPM(self.pool_scales, self.channels,
                               dtype=self.dtype, name="ppm")(top, train=train)
        top = ConvModule(self.channels, 3, dtype=self.dtype,
                         name="bottleneck")(
            jnp.concatenate(ppm_outs, axis=-1), train=train)

        # lateral convs + top-down pathway
        laterals = [
            ConvModule(self.channels, 1, dtype=self.dtype,
                       name=f"lateral{i}")(f, train=train)
            for i, f in enumerate(feats[:-1])
        ] + [top]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize(laterals[i], (h, w))

        fpn_outs = [
            ConvModule(self.channels, 3, dtype=self.dtype,
                       name=f"fpn{i}")(laterals[i], train=train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        h, w = fpn_outs[0].shape[1:3]
        fused = jnp.concatenate(
            [resize(f, (h, w)) for f in fpn_outs], axis=-1)
        fused = ConvModule(self.channels, 3, dtype=self.dtype,
                           name="fuse")(fused, train=train)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="seg")(fused)


class FCNHead(nn.Module):
    """Auxiliary FCN head (1 conv) on a single pyramid level."""

    num_classes: int
    channels: int = 256
    num_convs: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.num_convs):
            x = ConvModule(self.channels, 3, dtype=self.dtype,
                           name=f"conv{i}")(x, train=train)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="seg")(x)


class UperNet(nn.Module):
    """EncoderDecoder: backbone feature pyramid -> UPerHead (+aux FCN)."""

    backbone: nn.Module
    num_classes: int
    channels: int = 512
    aux_index: int = 2        # stage-3 feature (index 2 of the 4 outputs)
    aux_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, with_aux: bool = False):
        h, w = x.shape[1:3]
        feats = self.backbone(x, train=train)
        logits = UPerHead(self.num_classes, self.channels, dtype=self.dtype,
                          name="decode_head")(feats, train=train)
        logits = resize(logits, (h, w))
        if with_aux:
            aux = FCNHead(self.num_classes, self.aux_channels,
                          dtype=self.dtype, name="aux_head")(
                feats[self.aux_index], train=train)
            return logits, resize(aux, (h, w))
        return logits


def slide_inference(apply_fn, x: jax.Array, num_classes: int,
                    crop_size: int = 512, stride: int = 384) -> jax.Array:
    """Sliding-window inference (reference test_cfg mode='slide',
    crop 512^2 / stride 384). apply_fn: (crop) -> (B,ch,cw,num_classes).
    Static window count: grid positions are computed at trace time."""
    b, h, w, _ = x.shape
    hs = list(range(0, max(h - crop_size, 0) + 1, stride))
    ws = list(range(0, max(w - crop_size, 0) + 1, stride))
    if hs[-1] + crop_size < h:
        hs.append(h - crop_size)
    if ws[-1] + crop_size < w:
        ws.append(w - crop_size)
    logits = jnp.zeros((b, h, w, num_classes), jnp.float32)
    count = jnp.zeros((1, h, w, 1), jnp.float32)
    for y0 in hs:
        for x0 in ws:
            crop = jax.lax.dynamic_slice(
                x, (0, y0, x0, 0), (b, min(crop_size, h), min(crop_size, w),
                                    x.shape[3]))
            out = apply_fn(crop).astype(jnp.float32)
            logits = jax.lax.dynamic_update_slice(
                logits, jax.lax.dynamic_slice(
                    logits, (0, y0, x0, 0),
                    (b, out.shape[1], out.shape[2], num_classes)) + out,
                (0, y0, x0, 0))
            count = jax.lax.dynamic_update_slice(
                count, jax.lax.dynamic_slice(
                    count, (0, y0, x0, 0), (1, out.shape[1], out.shape[2], 1))
                + 1.0,
                (0, y0, x0, 0))
    return logits / jnp.maximum(count, 1.0)
