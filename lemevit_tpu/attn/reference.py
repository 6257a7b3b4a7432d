"""XLA reference attention: the numerics ground truth for the Pallas kernels.

Plain einsum attention with fp32 softmax. XLA already fuses the scale +
softmax + matmul chain well at LeMeViT's sequence lengths; the Pallas kernels
in lemevit_tpu.attn.pallas_dca exist to beat it on the DCA hot path and are
always tested against these functions.

Scale semantics (parity with /root/reference/models/lemevit.py):
  - standard / cross attention: head_dim ** -0.5 (:54-63 default scale)
  - dual cross-attention: *full embed dim* based, asymmetric —
      scale_x = log_N(M) * C**-0.5, scale_c = C**-0.5   (:252-256, :357-361)
    where N = #image tokens, M = #meta tokens, C = embed dim.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         scale: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention over (B, H, N, d) tensors.

    Softmax runs in fp32 regardless of input dtype (bf16-safe), output is
    cast back to the input dtype.
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def dca_scales(n_tokens: int, m_tokens: int, dim: int) -> tuple:
    """Asymmetric DCA softmax scales.

    scale_x (image tokens attend to meta tokens) = log_N(M) * C**-0.5
    scale_c (meta tokens attend to image tokens) = C**-0.5
    N and M are static under jit, so this is trace-time Python math.
    """
    base = dim ** -0.5
    scale_x = math.log(m_tokens, n_tokens) * base
    return scale_x, base


def sdpa_bnhd(q: jax.Array, k: jax.Array, v: jax.Array,
              scale: Optional[float] = None) -> jax.Array:
    """Attention in (B, N, H, d) layout — no head transposes.

    XLA folds the head axis into dot_general batch dims, so the data never
    moves; on TPU this saves two full transposes of the qkv tensor and one
    of the output per attention call vs. the (B,H,N,d) layout.

    Large self-attention (n_q * n_k > 4M — the all-"S" vit_tiny ablation
    at N=3136, or detection S-stages at 1024^2 where N=4096) routes to
    the query-chunked path: the one-shot fp32 score tensor would be
    f32[B,H,N,N] (30.8 GB for vit_tiny @ bs256 — measured HBM OOM).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    if q.shape[1] * k.shape[1] > 4 * 1024 * 1024:
        return sdpa_bnhd_chunked(q, k, v, scale)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def sdpa_bnhd_chunked(q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: Optional[float] = None,
                      target_bytes: int = 1 << 30) -> jax.Array:
    """Memory-efficient SDPA: lax.map over query chunks, full keys per
    chunk, fp32 softmax, jax.checkpoint so the backward recomputes each
    chunk's scores instead of storing them. Peak transient =
    B*H*chunk*n_k fp32 (sized to ~target_bytes) instead of the full
    B*H*n_q*n_k score tensor. Numerically identical to sdpa_bnhd
    (same einsums, softmax over the full key axis per query row)."""
    b, n, h, d = q.shape
    m = k.shape[1]
    scale = d ** -0.5 if scale is None else scale
    chunk = max(64, min(n, target_bytes // max(1, b * h * m * 4)))
    chunk = 1 << (chunk.bit_length() - 1)   # pow2 floor: even padding
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (n + pad) // chunk
    qc = qp.reshape(b, nc, chunk, h, d).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def one(qi):
        logits = jnp.einsum("bnhd,bmhd->bhnm", qi, k,
                            preferred_element_type=jnp.float32)
        logits = logits * jnp.float32(scale)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype),
                          v).astype(q.dtype)

    out = jax.lax.map(one, qc)              # (nc, b, chunk, h, d)
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, n + pad, h, d)
    return out[:, :n]


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, H*d) -> (B, H, N, d)."""
    b, n, c = x.shape
    x = x.reshape(b, n, num_heads, c // num_heads)
    return x.transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, N, d) -> (B, N, H*d)."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)
