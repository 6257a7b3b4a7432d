"""Fused Pallas MHSA kernel for LeMeViT's dense "S" stages.

LeMeViT's standard attention runs at N <= 196 (stage 3/4 of the 224^2
models) — q, k, v and the full NxN logits of ALL heads fit in VMEM at once.
The unfused XLA path materializes the fp32 (B, H, N, N) probability tensor
in HBM (~472 MB per base stage-3 block at batch 256), which is why the "S"
stages run at ~17% of peak; this kernel keeps logits entirely in VMEM.

Layout: (B, N, C) with C = num_heads * head_dim, heads sliced statically
along the lane dim (same convention as pallas_dca). Grid: (B,). Softmax in
fp32, output accumulated in fp32, stored in the input dtype.

Backward = XLA reference via custom_vjp.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    HAS_PLTPU = True
except ImportError:  # pragma: no cover
    HAS_PLTPU = False

_INTERPRET = False

# largest per-batch-row tile the kernel accepts without online softmax:
# q,k,v,out (N,C) + one (N,N) fp32 logits buffer must fit VMEM comfortably
_MAX_N = 1024
_MAX_VMEM_BYTES = 12 * 1024 * 1024


def _mhsa_kernel(q_ref, k_ref, v_ref, o_ref, *,
                 scale: float, num_heads: int, head_dim: int):
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # (N, N) fp32
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mhsa_op(q, k, v, scale, num_heads):
    b, n, c = q.shape
    d = c // num_heads
    spec = pl.BlockSpec((1, n, c), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_mhsa_kernel, scale=float(scale),
                               num_heads=num_heads, head_dim=d)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        interpret=_INTERPRET,
    )(q, k, v)


def _xla_mhsa(q, k, v, scale, num_heads):
    from lemevit_tpu.attn.reference import sdpa_bnhd
    b, n, c = q.shape
    sh = lambda t: t.reshape(b, n, num_heads, c // num_heads)
    return sdpa_bnhd(sh(q), sh(k), sh(v), scale=scale).reshape(b, n, c)


def _mhsa_fwd(q, k, v, scale, num_heads):
    return _mhsa_op(q, k, v, scale, num_heads), (q, k, v)


def _mhsa_bwd(scale, num_heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda *a: _xla_mhsa(*a, scale, num_heads), q, k, v)
    return vjp(g)


_mhsa_op.defvjp(_mhsa_fwd, _mhsa_bwd)


def mhsa(q, k, v, *, scale: Optional[float] = None, num_heads: int
         ) -> Optional[jax.Array]:
    """Fused self-attention over (B, N, C). Returns None if the shapes
    don't qualify (fallback to XLA)."""
    if not HAS_PLTPU:
        return None
    b, n, c = q.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    if n > _MAX_N or c % num_heads != 0:
        return None
    itemsize = jnp.dtype(q.dtype).itemsize
    vmem = 4 * n * c * itemsize + n * n * 4 * 2
    if vmem > _MAX_VMEM_BYTES:
        return None
    return _mhsa_op(q, k, v, scale, num_heads)


def sdpa(q, k, v, *, scale=None) -> Optional[jax.Array]:
    """(B, N, H, d) adapter used by the generic _sdpa dispatch: only engages
    for self-attention-sized inputs; cross-shapes fall back to XLA."""
    b, n, h, d = q.shape
    if k.shape[1] != n:
        return None
    qc = q.reshape(b, n, h * d)
    kc = k.reshape(b, n, h * d)
    vc = v.reshape(b, n, h * d)
    out = mhsa(qc, kc, vc, scale=scale, num_heads=h)
    if out is None:
        return None
    return out.reshape(b, n, h, d)
