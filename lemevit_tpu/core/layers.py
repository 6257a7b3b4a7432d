"""Core layers for the TPU-native LeMeViT framework.

All spatial tensors are NHWC (TPU-preferred layout); token tensors are
(B, N, C).  Compute dtype is configurable (bf16 on TPU by default at the
model level); parameters stay fp32.

Reference semantics these layers reproduce (cited for parity checking, the
implementation is original JAX):
  - conv stem / stage downsample: /root/reference/models/lemevit.py:698-720
  - meta-token MLP downsample:    /root/reference/models/lemevit.py:728-745
  - MLP (+ optional depthwise conv): /root/reference/models/lemevit.py:526-530
  - DropPath (timm stochastic depth), trunc-normal init (:789-796)
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# --------------------------------------------------------------------------
# Initializers (match torch defaults / the reference's _init_weights)
# --------------------------------------------------------------------------

def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated at +-2*std."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def torch_conv_init():
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    variance_scaling(1/3, fan_in, uniform) gives bound sqrt(3*(1/3)/fan_in)
    = 1/sqrt(fan_in), identical to the torch default.
    """
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    """torch Linear/Conv2d default bias: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default. jax.nn.gelu defaults to the
    tanh approximation, which breaks fp32 parity, so pin approximate=False."""
    return jax.nn.gelu(x, approximate=False)


# --------------------------------------------------------------------------
# Building blocks
# --------------------------------------------------------------------------

class ConvBN(nn.Module):
    """3x3 conv (stride s) + BatchNorm + optional GELU, on NHWC.

    Used by the stem and the stage downsample layers
    (/root/reference/models/lemevit.py:698-717).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    use_act: bool = False
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9  # torch momentum 0.1 == flax 0.9
    axis_name: Optional[str] = None  # set for cross-replica (Sync) BN

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.kernel_size // 2,
            kernel_init=torch_conv_init(),
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        if self.use_act:
            x = gelu(x)
        return x


class ConvStem(nn.Module):
    """Two 3x3 stride-2 convs with BN (+GELU between): image -> H/4 tokens.

    Mirrors the uniformer-style stem at /root/reference/models/lemevit.py:698-704.
    """

    features: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvBN(self.features // 2, use_act=True, dtype=self.dtype,
                   axis_name=self.axis_name, name="conv1")(x, train=train)
        x = ConvBN(self.features, use_act=False, dtype=self.dtype,
                   axis_name=self.axis_name, name="conv2")(x, train=train)
        return x


class DWConv(nn.Module):
    """Depthwise 3x3 conv on token tensors (B, N, C) given (H, W).

    Used as the conditional position embedding (CPE) inside every block and
    optionally inside the MLP (/root/reference/models/lemevit.py:66-79,509-512).
    """

    dim: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Optional[tuple] = None):
        tokens = x.ndim == 3
        if tokens:
            if hw is None:
                raise ValueError("DWConv on (B,N,C) tokens needs hw=(H,W)")
            h, w = hw
            b, n, c = x.shape
            x = x.reshape(b, h, w, c)
        fan_in = self.kernel_size * self.kernel_size  # depthwise: cin/group=1
        x = nn.Conv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            feature_group_count=self.dim,
            kernel_init=torch_conv_init(),
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            name="dwconv",
        )(x)
        if tokens:
            x = x.reshape(b, n, c)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch (timm DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer MLP: Dense -> (optional DWConv) -> GELU -> Dense.

    Matches /root/reference/models/lemevit.py:526-530. The same MLP instance
    is applied to both image tokens and meta tokens inside a block (weight
    sharing is part of the architecture, see LeMeBlock).
    """

    dim: int
    hidden_dim: int
    use_dwconv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Optional[tuple] = None):
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="fc1",
        )(x)
        if self.use_dwconv:
            x = DWConv(self.hidden_dim, dtype=self.dtype, name="dwconv")(x, hw)
        x = gelu(x)
        x = nn.Dense(
            self.dim,
            kernel_init=trunc_normal_init(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="fc2",
        )(x)
        return x


class MetaTokenDownsample(nn.Module):
    """Meta-token channel projection between stages:
    Dense(4*d_in) -> LN -> GELU -> Dense(d_out) -> LN.

    Matches /root/reference/models/lemevit.py:728-745 (LN eps = torch default
    1e-5 here, unlike the block norms which use 1e-6).
    """

    d_in: int
    d_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        c = nn.Dense(self.d_in * 4, kernel_init=trunc_normal_init(),
                     bias_init=nn.initializers.zeros_init(),
                     dtype=self.dtype, name="fc1")(c)
        c = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(c)
        c = gelu(c)
        c = nn.Dense(self.d_out, kernel_init=trunc_normal_init(),
                     bias_init=nn.initializers.zeros_init(),
                     dtype=self.dtype, name="fc2")(c)
        c = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(c)
        return c
