"""Plugin layers: ContextBlock (GCNet), NonLocal2D, GeneralizedAttention,
NAS-FPN merge cells, and a plugin registry.

Flax ports of the reference's pure-Python mmdet op modules
(object_detection/mmdet/ops/{context_block.py, non_local.py,
generalized_attention.py, merge_cells.py, plugin.py}) — re-implemented for
NHWC/XLA, same constructor surfaces.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemevit_tpu.tasks.upernet import resize

Dtype = Any

PLUGIN_LAYERS: Dict[str, Type[nn.Module]] = {}


def register_plugin(name: str):
    def deco(cls):
        PLUGIN_LAYERS[name] = cls
        return cls
    return deco


def build_plugin_layer(cfg: Dict, **kwargs) -> Tuple[str, nn.Module]:
    """mm-style: build_plugin_layer(dict(type='ContextBlock', ...))."""
    cfg = dict(cfg)
    name = cfg.pop("type")
    if name not in PLUGIN_LAYERS:
        raise KeyError(f"unknown plugin {name!r}; known: "
                       f"{sorted(PLUGIN_LAYERS)}")
    return name.lower(), PLUGIN_LAYERS[name](**cfg, **kwargs)


@register_plugin("ContextBlock")
class ContextBlock(nn.Module):
    """GCNet global-context block: softmax spatial pooling -> channel
    transform -> add/mul fusion."""

    in_channels: int
    ratio: float = 1.0 / 16.0
    pooling_type: str = "att"          # 'att' | 'avg'
    fusion_types: Sequence[str] = ("channel_add",)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(self.in_channels * self.ratio), 1)
        if self.pooling_type == "att":
            attn = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_mask")(x)
            attn = jax.nn.softmax(
                attn.reshape(b, h * w, 1).astype(jnp.float32), axis=1)
            ctx = jnp.einsum("bn1,bnc->bc", attn.astype(x.dtype),
                             x.reshape(b, h * w, c))
        else:
            ctx = x.mean(axis=(1, 2))
        ctx = ctx[:, None, None, :]

        def transform(name):
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f"{name}_fc1")(ctx)
            t = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(t)
            t = nn.relu(t)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           name=f"{name}_fc2")(t)

        out = x
        if "channel_mul" in self.fusion_types:
            out = out * jax.nn.sigmoid(transform("channel_mul"))
        if "channel_add" in self.fusion_types:
            out = out + transform("channel_add")
        return out


@register_plugin("NonLocal2D")
class NonLocal2D(nn.Module):
    """Non-local block (embedded gaussian / dot product / gaussian)."""

    in_channels: int
    reduction: int = 2
    mode: str = "embedded_gaussian"
    sub_sample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        if self.mode == "gaussian":
            theta, phi = x, x
        else:
            theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
            phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        if self.sub_sample:
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
            g = nn.max_pool(g, (2, 2), strides=(2, 2))
        n = h * w
        m = phi.shape[1] * phi.shape[2]
        theta = theta.reshape(b, n, -1)
        phi = phi.reshape(b, m, -1)
        g = g.reshape(b, m, inter)
        logits = jnp.einsum("bnc,bmc->bnm", theta, phi,
                            preferred_element_type=jnp.float32)
        if self.mode in ("embedded_gaussian", "gaussian"):
            attn = jax.nn.softmax(logits, axis=-1)
        else:  # dot_product
            attn = logits / m
        y = jnp.einsum("bnm,bmc->bnc", attn.astype(g.dtype), g)
        y = y.reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros_init(),
                    dtype=self.dtype, name="conv_out")(y)
        return x + y


@register_plugin("GeneralizedAttention")
class GeneralizedAttention(nn.Module):
    """Generalized attention (query/key content + relative position terms).

    Implements the content-content + content-position attention factorization
    (the '1111' configuration of the reference) over NHWC maps.
    """

    in_channels: int
    num_heads: int = 9
    spatial_range: int = -1
    kv_stride: int = 2
    q_stride: int = 1
    position_embedding_dim: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        qk_dim = max(c // heads, 1) * heads
        pos_dim = (self.position_embedding_dim
                   if self.position_embedding_dim > 0 else qk_dim)
        q_map = x[:, ::self.q_stride, ::self.q_stride]
        kv_map = x[:, ::self.kv_stride, ::self.kv_stride]
        qh, qw = q_map.shape[1:3]
        kh, kw = kv_map.shape[1:3]
        q = nn.Conv(qk_dim, (1, 1), dtype=self.dtype, name="query")(q_map)
        k = nn.Conv(qk_dim, (1, 1), dtype=self.dtype, name="key")(kv_map)
        v = nn.Conv(qk_dim, (1, 1), dtype=self.dtype, name="value")(kv_map)
        d = qk_dim // heads
        q = q.reshape(b, qh * qw, heads, d)
        k = k.reshape(b, kh * kw, heads, d)
        v = v.reshape(b, kh * kw, heads, d)
        # relative position embedding (sinusoidal, projected)
        ry = jnp.arange(kh)[:, None] / max(kh - 1, 1)
        rx = jnp.arange(kw)[None, :] / max(kw - 1, 1)
        pos = jnp.stack(jnp.broadcast_arrays(ry, rx), -1).reshape(kh * kw, 2)
        freq = jnp.exp(jnp.arange(pos_dim // 4) * (-np.log(100.0) /
                                                   max(pos_dim // 4, 1)))
        ang = pos[:, :, None] * freq[None, None, :]
        pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)],
                             -1).reshape(kh * kw, -1)
        pe = nn.Dense(d * heads, dtype=self.dtype, name="pos_proj")(
            pe.astype(self.dtype)).reshape(kh * kw, heads, d)
        logits = (jnp.einsum("bnhd,bmhd->bhnm", q, k,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("bnhd,mhd->bhnm", q, pe,
                               preferred_element_type=jnp.float32))
        attn = jax.nn.softmax(logits * (d ** -0.5), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
        out = out.reshape(b, qh, qw, qk_dim)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(out)
        if (qh, qw) != (h, w):
            out = resize(out, (h, w))
        return x + out


class SumCell(nn.Module):
    """NAS-FPN sum merge cell: resize to out size, conv(sum)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, out_size=None, *, train: bool = False):
        out_size = out_size or a.shape[1:3]
        a = resize(a, out_size, method="nearest")
        b = resize(b, out_size, method="nearest")
        x = a + b
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=self.dtype, name="bn")(x)


class GlobalPoolingCell(nn.Module):
    """NAS-FPN GP cell: gate b by a's global pooling, then sum-merge."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, out_size=None, *, train: bool = False):
        out_size = out_size or a.shape[1:3]
        a = resize(a, out_size, method="nearest")
        b = resize(b, out_size, method="nearest")
        gate = jax.nn.sigmoid(a.mean(axis=(1, 2), keepdims=True))
        x = a + b * gate
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=self.dtype, name="bn")(x)
