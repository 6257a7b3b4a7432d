"""Flax attention modules for LeMeViT.

Four attention forms, keyed by the per-stage ``attn_type`` string:
  "S"  StandardAttention      — fused-QKV MHSA (ref lemevit.py:156-217)
  "C"  CrossAttention         — meta-token init: q from c, k/v from image
                                tokens, only c is produced (:425-497)
  "D"  DualCrossAttention     — two QKV projections; x<-attn(q1,k2,v2),
                                c<-attn(q2,k1,v1), asymmetric scales (:220-324)
  "D2" DualCrossAttentionV2   — cheaper: q/v from x, k/v from c, q and k
                                shared across both directions (:326-423)

TPU layout policy: everything stays in (B, N, H, d) — the head axis rides as
a dot_general batch dim and the qkv tensor is never transposed (saves two
full HBM round-trips per attention vs. the (B,H,N,d) layout).

``backend`` selects the compute path: "xla" (einsum reference) or "pallas"
(fused TPU kernels, see lemevit_tpu.attn.pallas_dca). "auto" picks pallas on
TPU when the shapes qualify, else xla. Both paths are numerically cross-tested.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.attn import reference as ref
from lemevit_tpu.core.layers import trunc_normal_init

Dtype = Any


def _dense(features: int, dtype, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=trunc_normal_init(),
        bias_init=nn.initializers.zeros_init(),
        dtype=dtype,
        name=name,
    )


def _use_pallas(backend: str) -> bool:
    if backend == "xla":
        return False
    if backend == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _sdpa(backend: str, q, k, v, scale=None):
    """q/k/v in (B, N, H, d)."""
    if _use_pallas(backend):
        from lemevit_tpu.attn import pallas_mhsa
        out = pallas_mhsa.sdpa(q, k, v, scale=scale)
        if out is not None:
            return out
    return ref.sdpa_bnhd(q, k, v, scale=scale)


class StandardAttention(nn.Module):
    """Fused-QKV multi-head self-attention, softmax scale head_dim**-0.5."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h, d = self.num_heads, c // self.num_heads
        qkv = _dense(3 * c, self.dtype, "qkv")(x)
        out = None
        if _use_pallas(self.backend):
            from lemevit_tpu.attn import pallas_mhsa
            qc, kc, vc = jnp.split(qkv, 3, axis=-1)
            out = pallas_mhsa.mhsa(qc, kc, vc, num_heads=h)
        if out is None:
            r = qkv.reshape(b, n, 3, h, d)
            out = ref.sdpa_bnhd(r[:, :, 0], r[:, :, 1],
                                r[:, :, 2]).reshape(b, n, c)
        return _dense(c, self.dtype, "proj")(out)


class CrossAttention(nn.Module):
    """Meta-token initializer: c attends to image tokens; returns new c."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x, c):
        b, n, ch = x.shape
        _, m, _ = c.shape
        h, d = self.num_heads, ch // self.num_heads
        q = _dense(ch, self.dtype, "q")(c).reshape(b, m, h, d)
        kv = _dense(2 * ch, self.dtype, "kv")(x).reshape(b, n, 2, h, d)
        k, v = kv[:, :, 0], kv[:, :, 1]
        out = _sdpa(self.backend, q, k, v).reshape(b, m, ch)
        return _dense(ch, self.dtype, "proj")(out)


class DualCrossAttention(nn.Module):
    """DCA: image tokens and meta tokens swap query vs key/value roles.

    x <- attn(q1, k2, v2) with scale_x = log_N(M) * C**-0.5
    c <- attn(q2, k1, v1) with scale_c = C**-0.5
    (full-embed-dim scales; see attn/reference.py:dca_scales)
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x, c):
        b, n, ch = x.shape
        _, m, _ = c.shape
        h, d = self.num_heads, ch // self.num_heads
        scale_x, scale_c = ref.dca_scales(n, m, ch)

        qkv1 = _dense(3 * ch, self.dtype, "qkv1")(x)
        qkv2 = _dense(3 * ch, self.dtype, "qkv2")(c)

        pair = None
        if _use_pallas(self.backend):
            from lemevit_tpu.attn import pallas_dca
            q1c, k1c, v1c = jnp.split(qkv1, 3, axis=-1)
            q2c, k2c, v2c = jnp.split(qkv2, 3, axis=-1)
            pair = pallas_dca.dca(q1c, k1c, v1c, q2c, k2c, v2c,
                                  scale_x=scale_x, scale_c=scale_c,
                                  num_heads=h)
        if pair is None:
            r1 = qkv1.reshape(b, n, 3, h, d)
            r2 = qkv2.reshape(b, m, 3, h, d)
            x_out = ref.sdpa_bnhd(r1[:, :, 0], r2[:, :, 1], r2[:, :, 2],
                                  scale=scale_x).reshape(b, n, ch)
            c_out = ref.sdpa_bnhd(r2[:, :, 0], r1[:, :, 1], r1[:, :, 2],
                                  scale=scale_c).reshape(b, m, ch)
        else:
            x_out, c_out = pair

        x_out = _dense(ch, self.dtype, "proj_x")(x_out)
        c_out = _dense(ch, self.dtype, "proj_c")(c_out)
        return x_out, c_out


class DualCrossAttentionV2(nn.Module):
    """Cheaper DCA: shared q/k across directions.

    q, v1 from x; k, v2 from c.
    x <- attn(q, k, v2) with scale_x;  c <- attn(k, q, v1) with scale_c.
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    backend: str = "auto"

    @nn.compact
    def __call__(self, x, c):
        b, n, ch = x.shape
        _, m, _ = c.shape
        h, d = self.num_heads, ch // self.num_heads
        scale_x, scale_c = ref.dca_scales(n, m, ch)

        qv1 = _dense(2 * ch, self.dtype, "qv1")(x)
        kv2 = _dense(2 * ch, self.dtype, "kv2")(c)

        pair = None
        if _use_pallas(self.backend):
            # v2 maps onto the general DCA form by argument permutation:
            # q1=q, k1=q, v1=v1 (image side); q2=k, k2=k, v2=v2 (meta side).
            from lemevit_tpu.attn import pallas_dca
            qc, v1c = jnp.split(qv1, 2, axis=-1)
            kc, v2c = jnp.split(kv2, 2, axis=-1)
            pair = pallas_dca.dca(qc, qc, v1c, kc, kc, v2c,
                                  scale_x=scale_x, scale_c=scale_c,
                                  num_heads=h)
        if pair is None:
            r1 = qv1.reshape(b, n, 2, h, d)
            r2 = kv2.reshape(b, m, 2, h, d)
            q, v1 = r1[:, :, 0], r1[:, :, 1]
            k, v2 = r2[:, :, 0], r2[:, :, 1]
            x_out = ref.sdpa_bnhd(q, k, v2,
                                  scale=scale_x).reshape(b, n, ch)
            c_out = ref.sdpa_bnhd(k, q, v1,
                                  scale=scale_c).reshape(b, m, ch)
        else:
            x_out, c_out = pair

        x_out = _dense(ch, self.dtype, "proj_x")(x_out)
        c_out = _dense(ch, self.dtype, "proj_c")(c_out)
        return x_out, c_out
