"""Swin Transformer feature-pyramid backbone (NHWC flax, original impl).

Capability parity with the CD vertical's vendored swin_transformer.py
(change_detection/models/swin_transformer.py, 731 LoC torch): 4-stage
hierarchical ViT with windowed (and shifted-window) attention, relative
position bias, patch merging; features_only returns the stride-4/8/16/32
pyramid like the LeMeViT/ResNet backbones.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemevit_tpu.core.layers import Mlp, DropPath, trunc_normal_init

Dtype = Any


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        bw, n, c = x.shape
        h, d = self.num_heads, c // self.num_heads
        ws = self.window_size
        qkv = nn.Dense(3 * c, kernel_init=trunc_normal_init(),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        rpb_table = self.param(
            "rel_pos_bias", trunc_normal_init(),
            ((2 * ws - 1) ** 2, h))
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, h)
        logits = logits + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        if mask is not None:  # shifted-window attention mask
            nw = mask.shape[0]
            logits = logits.reshape(bw // nw, nw, h, n, n) + \
                mask[None, :, None].astype(jnp.float32)
            logits = logits.reshape(bw, h, n, n)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
        out = out.reshape(bw, n, c)
        return nn.Dense(c, kernel_init=trunc_normal_init(),
                        dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = x.shape[1:3]
        mask = None
        if shift:
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[:, hs, wsl] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).squeeze(-1)
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -1e9, 0.0)
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               dtype=self.dtype, name="attn")(windows, mask)
        x = window_reverse(attn, ws, hp, wp)
        if pad_h or pad_w:
            x = x[:, :h, :w]
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(y.reshape(b, h * w, c)).reshape(b, h, w, c)
        return x + dp(y, deterministic=deterministic)


class SwinTransformer(nn.Module):
    """features_only Swin: returns [C2..C5] NHWC maps."""

    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.1
    features_only: bool = True
    num_classes: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        # patch embed: 4x4 non-overlapping conv
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    kernel_init=trunc_normal_init(), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm0")(x)
        dp = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        feats = []
        cur = 0
        for i, depth in enumerate(self.depths):
            if i > 0:  # patch merging: 2x2 concat + reduction (pad odd dims)
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
                    b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * c)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"merge_norm{i}")(x)
                x = nn.Dense(self.dims[i], use_bias=False,
                             kernel_init=trunc_normal_init(),
                             dtype=self.dtype, name=f"merge{i}")(x)
            for j in range(depth):
                x = SwinBlock(
                    self.dims[i], self.num_heads[i], self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    drop_path=dp[cur + j], dtype=self.dtype,
                    name=f"stage{i}_block{j}")(x, deterministic=not train)
            cur += depth
            feats.append(x)
        if self.features_only:
            return feats
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="head")(x)


def swin_tiny(**kw) -> SwinTransformer:
    return SwinTransformer(depths=(2, 2, 6, 2), dims=(96, 192, 384, 768),
                           num_heads=(3, 6, 12, 24), **kw)
