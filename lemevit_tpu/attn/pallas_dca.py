"""Fused Pallas TPU kernel for Dual Cross-Attention.

Computes BOTH DCA directions in one pass over the image tokens
(/root/reference/models/lemevit.py:220-324 semantics, (B,N,H,D) layout):

  x_out[n] = softmax_m(q1[n] . k2[m] * scale_x) @ v2      (M ~ 16 cols:
             row softmax completes inside one tile)
  c_out[m] = softmax_n(q2[m] . k1[n] * scale_c) @ v1      (softmax over all
             N: online/flash accumulation across N tiles)

The large N-length tensors (q1, k1, v1) stream HBM->VMEM exactly once; the
meta-token tensors (M x D) stay resident in VMEM; neither direction ever
materializes its logits in HBM (XLA's unfused path writes the fp32
(B,H,N,M) and (B,H,M,N) probability tensors back to HBM between the two
matmuls).

Grid: (B, H, N/TN), N-tile innermost so the c-direction accumulators
(scratch, fp32) persist across the tiles of one (batch, head) and reset at
tile 0. Backward runs through the XLA reference path via custom_vjp
(correct, unfused; fusing the backward is a later milestone).
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
                *, scale_x: float, scale_c: float, n_tiles: int):
    t = pl.program_id(2)

    q1 = q1_ref[0, :, 0, :]  # (TN, D)
    k1 = k1_ref[0, :, 0, :]
    v1 = v1_ref[0, :, 0, :]
    q2 = q2_ref[0, :, 0, :]  # (M, D)
    k2 = k2_ref[0, :, 0, :]
    v2 = v2_ref[0, :, 0, :]

    # ---- x direction: rows of image tokens attend to M meta tokens.
    s = jax.lax.dot_general(
        q1, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale_x        # (TN, M)
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    xo = jax.lax.dot_general(
        p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xo_ref[0, :, 0, :] = xo.astype(xo_ref.dtype)

    # ---- c direction: meta tokens attend to all N image tokens (online).
    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s2 = jax.lax.dot_general(
        q2, k1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale_c        # (M, TN)
    m_prev = m_scr[:]                                        # (M, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p2 = jnp.exp(s2 - m_cur)                                 # (M, TN)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p2, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p2.astype(v1.dtype), v1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_cur

    @pl.when(t == n_tiles - 1)
    def _():
        co_ref[0, :, 0, :] = (acc_scr[:] / l_scr[:]).astype(co_ref.dtype)


def _dca_forward(q1, k1, v1, q2, k2, v2, scale_x, scale_c, tile_n):
    b, n, h, d = q1.shape
    _, m, _, _ = q2.shape
    n_tiles = pl.cdiv(n, tile_n)

    img_spec = pl.BlockSpec(
        (1, tile_n, 1, d), lambda bi, hi, ti: (bi, ti, hi, 0),
        memory_space=pltpu.VMEM)
    meta_spec = pl.BlockSpec(
        (1, m, 1, d), lambda bi, hi, ti: (bi, 0, hi, 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _dca_kernel, scale_x=float(scale_x), scale_c=float(scale_c),
        n_tiles=n_tiles)

    return pl.pallas_call(
        kernel,
        grid=(b, h, n_tiles),
        in_specs=[img_spec, img_spec, img_spec,
                  meta_spec, meta_spec, meta_spec],
        out_specs=[img_spec, meta_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, h, d), q1.dtype),
            jax.ShapeDtypeStruct((b, m, h, d), q2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, d), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q1, k1, v1, q2, k2, v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c):
    tile_n = _pick_tile(q1.shape[1])
    return tuple(_dca_forward(q1, k1, v1, q2, k2, v2, scale_x, scale_c,
                              tile_n))


def _xla_dca(q1, k1, v1, q2, k2, v2, scale_x, scale_c):
    from lemevit_tpu.attn.reference import sdpa_bnhd
    return (sdpa_bnhd(q1, k2, v2, scale=scale_x),
            sdpa_bnhd(q2, k1, v1, scale=scale_c))


def _dca_fwd(q1, k1, v1, q2, k2, v2, scale_x, scale_c):
    out = _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c)
    return out, (q1, k1, v1, q2, k2, v2)


def _dca_bwd(scale_x, scale_c, res, grads):
    # Backward through the (numerically identical) XLA composition.
    q1, k1, v1, q2, k2, v2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_dca(*a, scale_x, scale_c), q1, k1, v1, q2, k2, v2)
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


def dca(q1, k1, v1, q2, k2, v2, *, scale_x: float, scale_c: float
        ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused DCA. Returns None when shapes don't qualify (caller falls back
    to XLA). Requirements: N divisible by a supported tile, M <= 128."""
    if not HAS_PLTPU:
        return None
    b, n, h, d = q1.shape
    m = q2.shape[1]
    if m > 128 or d > 128 or _pick_tile(n) == 0:
        return None
    return _dca_op(q1, k1, v1, q2, k2, v2, scale_x, scale_c)
