"""Fused Pallas TPU kernel for Dual Cross-Attention.

Computes BOTH DCA directions in one pass over the image tokens
(/root/reference/models/lemevit.py:220-324 semantics):

  x_out[n] = softmax_m(q1[n] . k2[m] * scale_x) @ v2      (M ~ 16 cols:
             row softmax completes inside one tile)
  c_out[m] = softmax_n(q2[m] . k1[n] * scale_c) @ v1      (softmax over all
             N: online/flash accumulation across N tiles)

Layout: inputs are (B, N, C) / (B, M, C) with C = num_heads * head_dim —
the natural layout right after the QKV projection, so NO transposes are
needed anywhere. Heads are processed by static slicing along the lane
dimension inside the kernel (C = 64..512 lanes). The large N-length tensors
stream HBM->VMEM exactly once; neither direction materializes its
(B,H,N,M)/(B,H,M,N) probabilities in HBM (the unfused XLA path does).

Grid: (B, N/TN), N-tile innermost so the c-direction accumulators (fp32
VMEM scratch) persist across the tiles of one batch row and reset at tile 0.
Backward runs through the XLA reference path via custom_vjp.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    HAS_PLTPU = True
except ImportError:  # pragma: no cover
    HAS_PLTPU = False

_INTERPRET = False  # flip for CPU debugging


def _dca_kernel(q1_ref, k1_ref, v1_ref, q2_ref, k2_ref, v2_ref,
                xo_ref, co_ref,
                m_scr, l_scr, acc_scr,
                *, scale_x: float, scale_c: float, n_tiles: int,
                num_heads: int, head_dim: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q1 = q1_ref[0, :, sl]  # (TN, D)
        k1 = k1_ref[0, :, sl]
        v1 = v1_ref[0, :, sl]
        q2 = q2_ref[0, :, sl]  # (M, D)
        k2 = k2_ref[0, :, sl]
        v2 = v2_ref[0, :, sl]

        # ---- x direction: image tokens attend to the M meta tokens.
        s = jax.lax.dot_general(
            q1, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale_x     # (TN, M)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        xo = jax.lax.dot_general(
            p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xo_ref[0, :, sl] = xo.astype(xo_ref.dtype)

        # ---- c direction: meta tokens attend to all N tokens (online).
        s2 = jax.lax.dot_general(
            q2, k1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale_c     # (M, TN)
        hs = slice(h, h + 1)
        m_prev = m_scr[:, hs]                                 # (M, 1)
        m_cur = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p2 = jnp.exp(s2 - m_cur)                              # (M, TN)
        l_scr[:, hs] = l_scr[:, hs] * alpha + jnp.sum(p2, axis=1,
                                                      keepdims=True)
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot_general(
            p2.astype(v1.dtype), v1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, hs] = m_cur

    @pl.when(t == n_tiles - 1)
    def _():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            co_ref[0, :, sl] = (acc_scr[:, sl]
                                / l_scr[:, h:h + 1]).astype(co_ref.dtype)


def _dca_forward(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads,
                 tile_n):
    b, n, c = q1.shape
    _, m, _ = q2.shape
    d = c // num_heads
    n_tiles = pl.cdiv(n, tile_n)

    img_spec = pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    meta_spec = pl.BlockSpec((1, m, c), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _dca_kernel, scale_x=float(scale_x), scale_c=float(scale_c),
        n_tiles=n_tiles, num_heads=num_heads, head_dim=d)

    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[img_spec, img_spec, img_spec,
                  meta_spec, meta_spec, meta_spec],
        out_specs=[img_spec, meta_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), q1.dtype),
            jax.ShapeDtypeStruct((b, m, c), q2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, num_heads), jnp.float32),
            pltpu.VMEM((m, num_heads), jnp.float32),
            pltpu.VMEM((m, c), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q1, k1, v1, q2, k2, v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads):
    tile_n = _pick_tile(q1.shape[1])
    return tuple(_dca_forward(q1, k1, v1, q2, k2, v2, scale_x, scale_c,
                              num_heads, tile_n))


def _split(t, num_heads):
    b, n, c = t.shape
    return t.reshape(b, n, num_heads, c // num_heads)


def _xla_dca(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads):
    from lemevit_tpu.attn.reference import sdpa_bnhd
    b, n, c = q1.shape
    m = q2.shape[1]
    xo = sdpa_bnhd(_split(q1, num_heads), _split(k2, num_heads),
                   _split(v2, num_heads), scale=scale_x)
    co = sdpa_bnhd(_split(q2, num_heads), _split(k1, num_heads),
                   _split(v1, num_heads), scale=scale_c)
    return xo.reshape(b, n, c), co.reshape(b, m, c)


def _dca_fwd(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads):
    out = _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads)
    return out, (q1, k1, v1, q2, k2, v2)


def _dca_bwd(scale_x, scale_c, num_heads, res, grads):
    # Backward through the (numerically identical) XLA composition.
    q1, k1, v1, q2, k2, v2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_dca(*a, scale_x, scale_c, num_heads),
        q1, k1, v1, q2, k2, v2)
    return vjp(grads)


_dca_op.defvjp(_dca_fwd, _dca_bwd)


def _pick_tile(n: int) -> int:
    # LeMeViT DCA runs at N = 56^2 = 3136 (= 448*7) and 28^2 = 784 (= 112*7),
    # so the tile menu includes 7-smooth sizes; all are multiples of the
    # bf16 sublane quantum (16).
    if n <= 512 and n % 16 == 0:
        return n
    for tile in (512, 448, 256, 224, 128, 112):
        if n % tile == 0:
            return tile
    return 0


def dca(q1, k1, v1, q2, k2, v2, *, scale_x: float, scale_c: float,
        num_heads: int) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused DCA over (B, N, C) / (B, M, C) tensors (C = heads * head_dim).
    Returns None when shapes don't qualify (caller falls back to XLA)."""
    if not HAS_PLTPU:
        return None
    b, n, c = q1.shape
    m = q2.shape[1]
    if m % 8 != 0 or c % num_heads != 0 or _pick_tile(n) == 0:
        return None
    return _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c, num_heads)
