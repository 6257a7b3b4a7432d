"""Fully-fused LeMeBlock Pallas kernels (inference path).

The DCA/MHSA stages are HBM-bound: the unfused XLA block reads/writes the
(B,N,C) activations ~16x per block (LN, qkv, attention, proj, residuals,
MLP). These kernels execute an ENTIRE pre-norm LeMeBlock per grid step with
all weights resident in VMEM, so x streams HBM->VMEM once and back once.

Two kernels:
  - s_block: "S"-type block — self-attention + shared-MLP applied to the
    image tokens AND (with the same weights) to the meta tokens
    (ref models/lemevit.py:615-650). Grid (B,); N <= 1024 per row.
  - dca_block: "D"-type block — dual cross-attention with the two token
    streams updated through the shared MLP (ref :542-582). Grid
    (B, N-tiles) with online softmax + carry-over scratch for the meta
    direction; the meta branch finalizes on the last tile.

Inference-only (deterministic; no DropPath) — training falls back to the
XLA composition, whose numerics these kernels match (tested in interpret
mode). Pre-norm, no layer-scale (all released LeMeViT variants).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    HAS_PLTPU = True
except ImportError:  # pragma: no cover
    HAS_PLTPU = False

_INTERPRET = False
_MAX_N_SBLOCK = 1024
# Joint-softmax head grouping (see _attn_rows). PB_GROUP=0 reverts every
# call site to the per-head loop — kept as an A/B lever for kbench.
_GROUP = os.environ.get("PB_GROUP", "1") != "0"
# PB_GC=0 forces the ONLINE (thin-query) attention to the per-head loop
# while keeping joint grouping for the wide-query directions.
_GROUP_ONLINE = os.environ.get("PB_GC", "1") != "0"
# PB_EW=1 evaluates LN-apply/GELU in the input dtype (bf16 in prod) in the
# row-unfolded kernels; fp32 inputs keep fp32 elementwise either way.
_EW = os.environ.get("PB_EW", "0") != "0"
# PB_JOINT=0 disables row-JOINT attention (all folded images in one
# _attn_rows call — see _rowjoint_mask) in the folded kernels.
_JOINT = os.environ.get("PB_JOINT", "1") != "0"


def _ln(t, scale, bias, eps=1e-6, ew=jnp.float32):
    """LayerNorm: fp32 statistics, `ew`-dtype application.

    scale=None skips the affine part (2 VPU passes) — used when the
    caller has FOLDED scale/bias into the following matmul's weights and
    bias (W' = diag(s) @ W, b' = b_ln @ W + b), which is exact up to one
    extra rounding of the weight product.

    ew=bf16 roughly doubles VPU rate but was a measured net LOSS on v5e
    (bench 2868 -> 2612 img/s with PB_EW=1): the dtype casts cost more
    passes than the width saves. Kept as an A/B lever."""
    t32 = t.astype(jnp.float32)
    mu = jnp.mean(t32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t32 - mu), axis=-1, keepdims=True)
    out = ((t32 - mu) * jax.lax.rsqrt(var + eps)).astype(ew)
    if scale is None:
        return out
    return out * scale.astype(ew) + bias.astype(ew)


# erf(x) = x * P(s), s = 2 x^2 / B^2 - 1, fit on |x| <= B = 3.925 (weighted
# Chebyshev LSQ in the scaled domain; fp32 Horner max |err| = 5.1e-7).
# Clamping x to [-B, B] handles the tail (erf(B) = 1 - 2.9e-8). Pure
# multiply-add: no exp / divide, which are multi-pass VPU transcendentals
# and dominated the old Abramowitz-Stegun form on the (N, 4C) GELU tensor.
_ERF_B = 3.925
_ERF_P = (3.6027794364e-01, -1.7988466805e-01, 1.3393152019e-01,
          -1.0907175299e-01, 9.0606976620e-02, -7.4288916019e-02,
          5.8309038237e-02, -4.2462337431e-02, 3.0498341857e-02,
          -2.3130013672e-02, 1.3295609324e-02, -3.5220870811e-03,
          2.7808746265e-03, -4.4408601711e-03, 1.8774974659e-03)


def _erf(x):
    """Polynomial erf (odd, degree-29 in x): |err| < 5.1e-7, no exp/divide
    — fp32-grade; Pallas TPU has no erf primitive."""
    xc = jnp.clip(x, -_ERF_B, _ERF_B)
    s = xc * xc * jnp.asarray(2.0 / (_ERF_B * _ERF_B), x.dtype) \
        - jnp.asarray(1.0, x.dtype)
    acc = jnp.asarray(_ERF_P[-1], x.dtype)
    for coef in _ERF_P[-2::-1]:
        acc = acc * s + jnp.asarray(coef, x.dtype)
    return xc * acc


# bf16-grade erf: erf(t) ~ tanh(t*(p1 + u*(p3 + u*p5))), u = t^2, fit by
# least squares on [0, 6]; max erf err 4.1e-5 -> max GELU err 4.9e-5
# absolute = 1% of the bf16 ulp of |x| (validated over [-10, 10]). tanh is
# a single-pass hardware transcendental on TPU (measured ~free in
# scripts/vpu_probe.py, vs ~5us/pass for a 7-FMA Horner at stage-3 sizes),
# so this is ~6 cheap VPU ops total. The |t| <= 6 clamp keeps the quintic
# argument in its monotone range (it turns over at t ~ 6.15).
_ERF_TANH_P = (1.12812423, 0.10414107, -0.00181363)


def _gelu(t, ew=jnp.float32, fast=False):
    # exact (erf-form) GELU evaluated in `ew` (parity with torch nn.GELU;
    # evaluation error << representation error of the stored result).
    # fast=True (bf16-stored results) uses the tanh-erf form above.
    te = t.astype(ew)
    if fast:
        p1, p3, p5 = (jnp.asarray(v, ew) for v in _ERF_TANH_P)
        tt = jnp.clip(te * jnp.asarray(0.7071067811865476, ew),
                      -6.0, 6.0)
        u = tt * tt
        e = jnp.tanh(tt * (p1 + u * (p3 + u * p5)))
        return (0.5 * te * (1.0 + e)).astype(ew)
    return (0.5 * te * (1.0 + _erf(te * jnp.asarray(
        0.7071067811865476, ew)))).astype(ew)


def _cpe_flat(xt, wc, bc, hh, ww):
    """Conditional position embedding fused on the flat (N, C) tile:
    x + depthwise3x3(x) expressed as 9 masked row-shifted adds (N = H*W,
    y-shift == shift by W flat rows). Matches a padding-1 depthwise conv.
    wc: (9, C) taps in (ky, kx) order; bc: (1, C)."""
    n, c = xt.shape
    img_n = hh * ww  # rows per image; n may be rows-folded (r images)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    xcol = row_ids % ww
    img_row = row_ids % img_n
    zeros = jnp.zeros_like(xt)
    dt = xt.dtype

    def rshift(t, s):
        # zero-padded flat-row shift via static slice + concat (pltpu.roll
        # crashes the Mosaic compiler on these shapes)
        if s == 0:
            return t
        if s > 0:
            return jnp.concatenate([t[s:], zeros[:s]], axis=0)
        return jnp.concatenate([zeros[:(-s)], t[:n + s]], axis=0)

    # Separable-accumulation form (~26 VPU passes vs 36 for the naive
    # 9-tap loop): the three x-shifted copies are built ONCE with their
    # column masks folded in, each horizontal partial sum z_dy reuses
    # them, and only z_{+-1} pay a row shift + image-boundary mask.
    sxm = rshift(xt, -1) * (xcol > 0).astype(dt)        # left-neighbor
    sxp = rshift(xt, 1) * (xcol < ww - 1).astype(dt)    # right-neighbor
    tap = lambda ky, kx: wc[ky * 3 + kx].astype(dt)
    z = [sxm * tap(ky, 0) + xt * tap(ky, 1) + sxp * tap(ky, 2)
         for ky in range(3)]
    acc = bc.astype(dt) + z[1]
    acc = acc + rshift(z[0], -ww) * (img_row >= ww).astype(dt)
    acc = acc + rshift(z[2], ww) * (img_row < img_n - ww).astype(dt)
    return xt + acc


def _cpe_tap_grads_flat(xt, du, hh, ww):
    """In-kernel tap/bias grads of the fused 3x3 CPE on the flat folded
    tile: dW[ky*3+kx, c] = sum_i du[i, c] * x[i + (ky-1)ww + (kx-1), c]
    (masked exactly like _cpe_flat's forward shifts), dbias = colsum(du).
    Returns a (16, C) f32 block — rows 0-8 taps, row 9 bias, rows 10-15
    zero (sublane-aligned accumulator). Replaces the XLA
    conv-backward-filter pass (pallas_train._cpe_grads), which re-read
    BOTH full activation streams from HBM in f32; here everything is
    already VMEM-resident (ROADMAP lever #1: in-kernel CPE tap-grad
    accumulation)."""
    n, c = xt.shape
    img_n = hh * ww
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    xcol = row_ids % ww
    img_row = row_ids % img_n
    zeros = jnp.zeros_like(xt)
    dt = xt.dtype
    f32 = jnp.float32

    def rshift(t, s):
        if s == 0:
            return t
        if s > 0:
            return jnp.concatenate([t[s:], zeros[:s]], axis=0)
        return jnp.concatenate([zeros[:(-s)], t[:n + s]], axis=0)

    sx = [rshift(xt, -1) * (xcol > 0).astype(dt), xt,
          rshift(xt, 1) * (xcol < ww - 1).astype(dt)]
    du32 = du.astype(f32)
    rows_out = []
    for s, mask in ((-ww, img_row >= ww), (0, None),
                    (ww, img_row < img_n - ww)):
        for kx in range(3):
            xs = sx[kx] if s == 0 else rshift(sx[kx], s) * mask.astype(dt)
            rows_out.append(jnp.sum(xs.astype(f32) * du32, axis=0,
                                    keepdims=True))
    rows_out.append(jnp.sum(du32, axis=0, keepdims=True))
    return jnp.concatenate(rows_out + [jnp.zeros((6, c), f32)], axis=0)


def _pick_group(num_heads: int, head_dim: int) -> int:
    """Largest divisor g of num_heads with g*head_dim <= 128 (uniform head
    groups so one block mask serves every group). 1 disables grouping."""
    if not _GROUP:
        return 1
    g = max(1, 128 // head_dim)
    while g > 1 and num_heads % g != 0:
        g -= 1
    return g


def _bd_mask(s, g, d, dtype):
    """(g*S, g*d) block-diagonal 0/1 mask: element (i, c) = 1 iff row i's
    S-block equals column c's d-block. Built OUTSIDE pallas_call and passed
    in as an input: in-kernel iota compares at this size re-run every grid
    step (~1ms/block at stage-0 scale, measured) while an input mask stays
    VMEM-resident."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * d), 0) // s
    ci = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * d), 1) // d
    return (ri == ci).astype(dtype)


def _bd_tile(t, g, mask):
    """Block-diagonally expand (S, g*d) -> (g*S, g*d) in two VPU ops:
    row-tile then multiply by the static block mask. Copy j keeps only head
    j's d-column block, so g heads' QK^T / PV contractions run as ONE
    full-lane MXU dot each (cross-head terms vanish by masking)."""
    if g == 1:
        return t
    return jnp.concatenate([t] * g, axis=0) * mask


def _rowjoint_mask(rows, seq_q, seq_k, g, dtype):
    """(rows*seq_q, g*rows*seq_k) 0/1 validity mask for row-JOINT
    attention: entry (i, j) = 1 iff query i's image row equals key j's
    (key j lives at flat row j % (rows*seq_k) of the g-fold bd expansion).
    Lets one _attn_rows call cover every folded image at once — the
    cross-image scores are real dot products, so they are struck from the
    softmax numerator AND normalizer by this elementwise multiply."""
    rq, rk = rows * seq_q, rows * seq_k
    qi = jax.lax.broadcasted_iota(jnp.int32, (rq, g * rk), 0) // seq_q
    kj = (jax.lax.broadcasted_iota(jnp.int32, (rq, g * rk), 1) % rk) // seq_k
    return (qi == kj).astype(dtype)


# Joint-softmax head grouping: all g heads' scores live in one (R, g*S)
# matrix (column block j = head j). ONE global row-max shifts every block by
# the same per-row constant (softmax-invariant), so a single exp pass covers
# all heads; the per-head normalizers come back as one MXU dot p @ mask,
# whose output replicates each block's sum across that head's d columns.
# The lower clip guards underflow in BOTH softmax forms (exp(-80)=1.8e-35
# is still a normal fp32): in the max-shifted branch it keeps a head whose
# scores sit far below the global row max finite, and in the shiftless
# branch it keeps a row whose every score is hugely negative from
# underflowing to a 0/0 = NaN — either way the degenerate row degrades to
# uniform attention, matching the reference's max-subtracted softmax.
# Shiftless softmax (PB_SHIFTLESS=0 restores max-shifting): scores are fp32,
# so exp without the max subtraction is mathematically identical as long as
# nothing overflows — fp32 exp holds to s=88, and the worst normalizer here
# is 3136 * e^70 = 7.9e33 << fp32 max. A single clip replaces the per-row
# max lane-reduction + subtract (VPU-expensive), and in the online path it
# removes the running-max/alpha-rescale machinery outright. Scores beyond
# +70 degrade to hard-max behavior instead of overflowing; the LOWER clip
# at -80 keeps exp() above fp32 underflow (e^-80 ~ 1.8e-35 > 0) so a row
# whose every score is hugely negative degrades to uniform attention —
# the max-subtracted softmax's behavior — instead of 0/0 = NaN.
_SHIFTLESS = os.environ.get("PB_SHIFTLESS", "1") != "0"
_POS_CLIP = 70.0
_NEG_CLIP = -80.0
# g*T rows above this crash the Mosaic compiler on v5e (expansion to
# (9408, 96) at DCA stage-1 scale; 3136 verified fine) — callers fall back
# to the per-head loop rather than tiling the expansion.
_MAX_BD_ROWS = 4096


def vmem_params():
    """Per-kernel scoped-VMEM limit for every pallas_call in this module
    (and pallas_train.py). XLA's 16 MB default is a COMPILER flag, not
    hardware (v5e carries 128 MB of VMEM); CompilerParams.vmem_limit_bytes
    lifts it per kernel so big-N stages can keep whole folded images
    resident. The byte-model budgets (PB_S_VMEM_MB / PB_DCA_VMEM_MB /
    PB_TRAIN_*_MB) still decide what the fold pickers accept — this only
    moves the compile-time ceiling they are calibrated against. No-op in
    interpret mode (CPU tests)."""
    if _INTERPRET or not HAS_PLTPU:
        return {}
    mb = int(os.environ.get("PB_VMEM_LIMIT_MB", "64"))
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=mb * 1024 * 1024)}


def _attn_rows(q, k, v, scale, num_heads, head_dim, out_dtype, mask=None,
               rowmask=None):
    """Attention on 2D (R,C)x(S,C) tiles; returns (R,C).

    With `mask` (the (g*S, g*d) block mask, g = mask cols // head_dim):
    joint-softmax head grouping — ~12 Mosaic ops per group instead of ~9
    per head, with full-lane MXU dots. The dots compute g x the needed
    FLOPs (zero blocks) — negligible next to qkv/MLP at these tile sizes.
    mask=None runs the per-head loop.

    With `rowmask` ((R, g*S) validity mask from _rowjoint_mask): row-JOINT
    mode — q/k/v carry `rows` folded images stacked along the row axis and
    ONE call covers every (image, head-group) pair: cross-image scores are
    struck from numerator and normalizer by the elementwise multiply.
    Requires the shiftless softmax (a joint running max would couple
    images). Collapses the per-step attention loop from rows*ceil(H/g)
    serialized small-dot groups to ceil(H/g)."""
    g = 1 if mask is None else mask.shape[1] // head_dim
    outs = []
    for h0 in range(0, num_heads, g):
        gs = slice(h0 * head_dim, (h0 + g) * head_dim)
        if g == 1:
            s = jax.lax.dot_general(
                q[:, gs], k[:, gs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if _SHIFTLESS:
                p = jnp.exp(jnp.clip(s, _NEG_CLIP, _POS_CLIP))
            else:
                p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
            if rowmask is not None:
                p = p * rowmask.astype(p.dtype)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v[:, gs], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            continue
        kbd = _bd_tile(k[:, gs], g, mask)
        vbd = _bd_tile(v[:, gs], g, mask)
        sc = jax.lax.dot_general(
            q[:, gs], kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if _SHIFTLESS:
            p = jnp.exp(jnp.clip(sc, _NEG_CLIP, _POS_CLIP)).astype(v.dtype)
        else:
            m = jnp.max(sc, axis=1, keepdims=True)
            p = jnp.exp(jnp.maximum(sc - m, _NEG_CLIP)).astype(v.dtype)
        if rowmask is not None:
            p = p * rowmask.astype(p.dtype)
        o_raw = jax.lax.dot_general(
            p, vbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lb = jax.lax.dot_general(
            p, mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(o_raw / lb)
    return (jnp.concatenate(outs, axis=-1) if len(outs) > 1
            else outs[0]).astype(out_dtype)


def _online_attn(q, k, v, scale, num_heads, head_dim, m_scr, l_scr, acc_scr,
                 dtype, mask=None):
    """One online-softmax step: q (M,C) attends to this tile's k/v (T,C),
    updating running stats and the fp32 accumulator in scratch. l_scr is
    lane-replicated (M, C): head h's normalizer occupies its d columns, so
    the final normalize is a single acc/l divide with no per-head slicing.

    With `mask` ((g*T, g*d) block mask): joint softmax per head group — the
    group shares ONE running max (stored in the group's first m_scr column)
    and the per-head tile sums come back replicated via a single p @ mask
    MXU dot."""
    tile = k.shape[0]
    g = 1 if mask is None else mask.shape[1] // head_dim
    for h0 in range(0, num_heads, g):
        gs = slice(h0 * head_dim, (h0 + g) * head_dim)
        hs = slice(h0, h0 + 1)           # (group-shared) running max slot
        if g == 1:
            s2 = jax.lax.dot_general(
                q[:, gs], k[:, gs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if _SHIFTLESS:
                # no running max: plain exp-sum accumulation (see _SHIFTLESS)
                pj = jnp.exp(jnp.clip(s2, _NEG_CLIP, _POS_CLIP))
                l_scr[:, gs] = l_scr[:, gs] + jnp.sum(pj, axis=1,
                                                      keepdims=True)
                acc_scr[:, gs] = acc_scr[:, gs] + jax.lax.dot_general(
                    pj.astype(dtype), v[:, gs], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                continue
            m_prev = m_scr[:, hs]
            m_cur = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)
            pj = jnp.exp(s2 - m_cur)
            l_scr[:, gs] = l_scr[:, gs] * alpha + jnp.sum(pj, axis=1,
                                                          keepdims=True)
            m_scr[:, hs] = m_cur
            acc_scr[:, gs] = acc_scr[:, gs] * alpha + jax.lax.dot_general(
                pj.astype(dtype), v[:, gs], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue
        kbd = _bd_tile(k[:, gs], g, mask)
        vbd = _bd_tile(v[:, gs], g, mask)
        sc = jax.lax.dot_general(
            q[:, gs], kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if _SHIFTLESS:
            p = jnp.exp(jnp.clip(sc, _NEG_CLIP, _POS_CLIP)).astype(dtype)
            l_scr[:, gs] = l_scr[:, gs] + jax.lax.dot_general(
                p, mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[:, gs] = acc_scr[:, gs] + jax.lax.dot_general(
                p, vbd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            continue
        m_prev = m_scr[:, hs]
        m_cur = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)  # (M, 1): broadcasts over the group
        p = jnp.exp(jnp.maximum(sc - m_cur, _NEG_CLIP)).astype(dtype)
        # per-head tile sums, replicated across each head's d columns
        l_scr[:, gs] = l_scr[:, gs] * alpha + jax.lax.dot_general(
            p, mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, hs] = m_cur
        acc_scr[:, gs] = acc_scr[:, gs] * alpha + jax.lax.dot_general(
            p, vbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mlp_residual(t, w1, b1, w2, b2, ln_s, ln_b, dtype, ew=jnp.float32):
    # t arrives as the fp32 attention-residual sum (callers skip the
    # bf16 round-trip: _ln's fp32 cast and the final residual add are
    # then cast-free; only the LN output is cast down for the MXU dot).
    # bf16-stored activations take the short erf poly: its error is ~12x
    # below the bf16 ulp, so the store quantization hides it entirely
    fast = dtype == jnp.bfloat16
    m = _ln(t, ln_s, ln_b, ew=ew).astype(dtype)
    y = jax.lax.dot_general(m, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = _gelu(y + b1.astype(jnp.float32), ew=ew, fast=fast).astype(dtype)
    y = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return t.astype(jnp.float32) + y + b2.astype(jnp.float32)


def _s_block_kernel(x_ref, c_ref,
                    wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                    jrowx_ref, jrowc_ref,
                    xo_ref, co_ref, *,
                    scale: float, num_heads: int, head_dim: int,
                    rows: int, n: int, m: int, use_cpe: bool,
                    img_w: int, g: int, joint_x: bool, joint_c: bool):
    """rows = batch rows folded into one grid step: the dense matmuls run on
    (rows*n, C) — per-step op overhead amortizes — while attention loops
    (row, head-group) pairs with independent softmaxes.

    Inputs arrive PRE-FOLDED as 2D (B*N, C)/(B*M, C) arrays blocked
    (rows*n, C) per step: the fold reshape happens OUTSIDE the pallas_call
    (a free XLA view), because the in-kernel (rows,N,C)->(rows*N,C) reshape
    is what crashed the Mosaic compiler at C=320 and large folds."""
    dtype = x_ref.dtype
    xflat = x_ref[:]
    if use_cpe:
        # one CPE pass over the folded flat array; per-image row masks
        # (rid % N) stop shifts from bleeding across images
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    xo, co = _s_body(
        xflat, c_ref[:],
        wqkv_ref[:], bqkv_ref[0], wp_ref[:], bp_ref[0],
        w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0],
        maskx_ref[:] if g > 1 else None,
        maskc_ref[:] if g > 1 else None,
        jrowx_ref[:] if joint_x else None,
        jrowc_ref[:] if joint_c else None,
        scale=scale, num_heads=num_heads, head_dim=head_dim, rows=rows,
        n=n, m=m, g=g, joint_x=joint_x, joint_c=joint_c, dtype=dtype)
    xo_ref[:] = xo
    co_ref[:] = co


def _s_body(xflat, cflat, wqkv, bqkv, wp, bp, w1, b1, w2, b2,
            maskx, maskc, jrowx, jrowc, *, scale, num_heads, head_dim,
            rows, n, m, g, joint_x, joint_c, dtype):
    """One whole S block on VMEM-resident values (weights already
    LN-folded). Shared by the per-block and stage-fused kernels."""
    ew = dtype if _EW else jnp.float32
    c_dim = xflat.shape[-1]

    def branch(t, seq, mask, jrow, joint):
        a = _ln(t, None, None, ew=ew).astype(dtype)
        qkv = jax.lax.dot_general(
            a, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv.astype(jnp.float32)).astype(dtype)
        q = qkv[:, :c_dim]
        k = qkv[:, c_dim:2 * c_dim]
        v = qkv[:, 2 * c_dim:]
        if joint:
            # row-JOINT: all folded images in one call per head group (the
            # bd mask arrives pre-sized (g*rows*seq, g*d) by the caller)
            o = _attn_rows(q, k, v, scale, num_heads, head_dim, dtype,
                           mask=mask, rowmask=jrow)
        else:
            outs = []
            for r in range(rows):
                rs = slice(r * seq, (r + 1) * seq)
                outs.append(_attn_rows(q[rs], k[rs], v[rs], scale,
                                       num_heads, head_dim, dtype,
                                       mask=mask))
            o = jnp.concatenate(outs, axis=0) if rows > 1 else outs[0]
        o = jax.lax.dot_general(o, wp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t1 = t.astype(jnp.float32) + o + bp.astype(jnp.float32)
        out = _mlp_residual(t1, w1, b1, w2, b2, None, None,
                            dtype, ew=ew)
        return out.astype(dtype)

    return (branch(xflat, n, maskx, jrowx, joint_x),
            branch(cflat, m, maskc, jrowc, joint_c))


def _weight_specs(shapes):
    return [pl.BlockSpec(s, lambda bi: tuple([0] * len(s)),
                         memory_space=pltpu.VMEM) for s in shapes]


def _fold_ln(s, bvec, w, b):
    """Fold an LN affine (s, bvec) into the matmul it feeds:
    LN(t) @ W + b == norm(t) @ (diag(s) @ W) + (bvec @ W + b), where
    norm(t) is the scale/bias-free normalization. Saves 2 VPU passes over
    the (N, C) activation per LN inside the kernels; exact up to one extra
    bf16 rounding of the weight product. Runs OUTSIDE pallas in the jitted
    wrapper (O(C^2), fused and hoisted by XLA). Folded bias stays fp32."""
    w32 = w.astype(jnp.float32)
    wf = (w32 * s.astype(jnp.float32)[:, None]).astype(w.dtype)
    bf = bvec.astype(jnp.float32) @ w32 + b.astype(jnp.float32)
    return wf, bf


def _pick_rows(b: int, n: int, ch: int, hidden: int) -> int:
    """Batch rows per grid step, bounded by a ~9MB VMEM activation budget.
    The fold reshape happens outside the kernel (2D blocking), so no Mosaic
    reshape blocklist applies here."""
    per_row = 2 * (2 * n * ch + 3 * n * ch + n * max(hidden, ch))
    budget = int(os.environ.get("PB_S_VMEM_MB", "9")) * 1024 * 1024
    rows = 1
    for r in (16, 8, 4, 2):
        if b % r == 0 and per_row * r < budget:
            rows = r
            break
    return rows


@functools.partial(jax.jit,
                   static_argnames=("scale", "num_heads", "img_w"))
def _s_block_call(x, c, params, scale, num_heads, cpe=None, img_w=0):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (ln1s, ln1b, wqkv, bqkv, wp, bp, ln2s, ln2b, w1, b1, w2, b2) = params
    hidden = w1.shape[1]
    rows = _pick_rows(b, n, ch, hidden)
    # biases/LN params as (1, C) rows for TPU 2D layout
    row = lambda t: t.reshape(1, -1)
    if cpe is None:
        wcpe = jnp.zeros((9, ch), x.dtype)
        bcpe = jnp.zeros((1, ch), x.dtype)
    else:
        wcpe, bcpe = cpe[0], row(cpe[1])
    g = _pick_group(num_heads, d)
    dummy = jnp.zeros((8, 128), x.dtype)
    # row-JOINT attention (one _attn_rows per head group covering all
    # folded images): needs the shiftless softmax; x-branch only when the
    # folded sequence is short (the bd expansion wastes FLOPs ~ (g*rows)x,
    # negligible for thin branches but not for rows*n in the hundreds+)
    joint_c = (_JOINT and _SHIFTLESS and rows > 1
               and g * rows * m <= _MAX_BD_ROWS)
    joint_x = (_JOINT and _SHIFTLESS and rows > 1 and rows * n <= 512
               and g * rows * n <= _MAX_BD_ROWS)
    maskx = (_bd_mask(rows * n if joint_x else n, g, d, x.dtype)
             if g > 1 else dummy)
    maskc = (_bd_mask(rows * m if joint_c else m, g, d, x.dtype)
             if g > 1 else dummy)
    jrowx = (_rowjoint_mask(rows, n, n, g, x.dtype) if joint_x else dummy)
    jrowc = (_rowjoint_mask(rows, m, m, g, x.dtype) if joint_c else dummy)
    wqkv_f, bqkv_f = _fold_ln(ln1s, ln1b, wqkv, bqkv)
    w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
    weights = [wqkv_f, row(bqkv_f), wp, row(bp),
               w1_f, row(b1_f), w2, row(b2),
               wcpe, bcpe, maskx, maskc, jrowx, jrowc]
    kernel = functools.partial(_s_block_kernel, scale=float(scale),
                               num_heads=num_heads, head_dim=d,
                               rows=rows, n=n, m=m,
                               use_cpe=cpe is not None, img_w=img_w or 1,
                               g=g, joint_x=joint_x, joint_c=joint_c)
    # fold OUTSIDE the kernel: 2D (B*N, C) views blocked (rows*N, C)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec = pl.BlockSpec((rows * n, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((rows * m, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    w_specs = _weight_specs([w.shape for w in weights])
    xo, co = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec] + w_specs,
        out_specs=[x_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x2.shape, x.dtype),
                   jax.ShapeDtypeStruct(c2.shape, c.dtype)],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x2, c2, *weights)
    return xo.reshape(x.shape), co.reshape(c.shape)


def _dca_block_kernel(x_ref, c_ref,
                      wqkv1_ref, bqkv1_ref, wqkv2_ref, bqkv2_ref,
                      wpx_ref, bpx_ref, wpc_ref, bpc_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref,
                      wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                      xo_ref, co_ref,
                      q2_scr, k2_scr, v2_scr, m_scr, l_scr, acc_scr,
                      *, scale_x: float, scale_c: float, n_tiles: int,
                      num_heads: int, head_dim: int, use_cpe: bool,
                      img_w: int, gx: int, gc: int):
    t = pl.program_id(1)
    dtype = x_ref.dtype
    ew = dtype if _EW else jnp.float32
    c_dim = x_ref.shape[-1]
    # LN affines pre-folded into wqkv1/wqkv2/w1 (see _fold_ln)

    @pl.when(t == 0)
    def _():
        ca = _ln(c_ref[0], None, None, ew=ew).astype(dtype)
        qkv2 = jax.lax.dot_general(
            ca, wqkv2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv2 = (qkv2 + bqkv2_ref[0].astype(jnp.float32)).astype(dtype)
        q2_scr[:] = qkv2[:, :c_dim]
        k2_scr[:] = qkv2[:, c_dim:2 * c_dim]
        v2_scr[:] = qkv2[:, 2 * c_dim:]
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # ---- image-token tile path
    xt = x_ref[0]
    if use_cpe:  # only engaged when the tile spans the whole image
        xt = _cpe_flat(xt, wcpe_ref[:], bcpe_ref[0],
                       xt.shape[0] // img_w, img_w)
    xa = _ln(xt, None, None, ew=ew).astype(dtype)
    qkv1 = jax.lax.dot_general(
        xa, wqkv1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv1 = (qkv1 + bqkv1_ref[0].astype(jnp.float32)).astype(dtype)
    q1 = qkv1[:, :c_dim]
    k1 = qkv1[:, c_dim:2 * c_dim]
    v1 = qkv1[:, 2 * c_dim:]

    # x direction: tile rows attend to the M meta tokens
    attn_x = _attn_rows(q1, k2_scr[:], v2_scr[:], scale_x, num_heads,
                        head_dim, dtype,
                        mask=maskx_ref[:] if gx > 1 else None)

    # c direction: online softmax over the N tiles
    _online_attn(q2_scr[:], k1, v1, scale_c, num_heads, head_dim,
                 m_scr, l_scr, acc_scr, dtype,
                 mask=maskc_ref[:] if gc > 1 else None)
    o = jax.lax.dot_general(attn_x, wpx_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x1 = xt.astype(jnp.float32) + o + bpx_ref[0].astype(jnp.float32)
    xo_ref[0] = _mlp_residual(x1, w1_ref[:], b1_ref[0],
                              w2_ref[:], b2_ref[0], None, None,
                              dtype, ew=ew).astype(dtype)

    @pl.when(t == n_tiles - 1)
    def _():
        attn_c = acc_scr[:] / l_scr[:]
        oc = jax.lax.dot_general(
            attn_c.astype(dtype), wpc_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        c1 = c_ref[0].astype(jnp.float32) + oc + bpc_ref[0].astype(
            jnp.float32)
        co = _mlp_residual(c1, w1_ref[:], b1_ref[0],
                           w2_ref[:], b2_ref[0], None, None, dtype, ew=ew)
        co_ref[0] = co.astype(dtype)


def _dca_rows_kernel(x_ref, c_ref,
                     wqkv1_ref, bqkv1_ref, wqkv2_ref, bqkv2_ref,
                     wpx_ref, bpx_ref, wpc_ref, bpc_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref,
                     wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                     jrowx_ref, jrowc_ref,
                     xo_ref, co_ref, *,
                     scale_x: float, scale_c: float, num_heads: int,
                     head_dim: int, rows: int, n: int, m: int,
                     gx: int, gc: int, use_cpe: bool, img_w: int,
                     joint_x: bool, joint_c: bool):
    """Single-tile (whole image per row) DCA block with batch-row folding:
    plain softmax (no online accumulation), flat matmuls over rows*N, and
    per-(row, head-group) attention loops. Inputs arrive pre-folded as 2D
    (B*N, C)/(B*M, C) arrays blocked (rows*n, C) per step (the in-kernel
    fold reshape was the Mosaic crash class — see _s_block_kernel)."""
    dtype = x_ref.dtype
    ew = dtype if _EW else jnp.float32
    c_dim = x_ref.shape[-1]

    xflat = x_ref[:]
    if use_cpe:
        # per-image row masks inside _cpe_flat stop the 3x3 shifts from
        # bleeding across the folded images
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    cflat = c_ref[:]
    # LN affines pre-folded into wqkv1/wqkv2/w1 (see _fold_ln)
    xa = _ln(xflat, None, None, ew=ew).astype(dtype)
    ca = _ln(cflat, None, None, ew=ew).astype(dtype)
    qkv1 = jax.lax.dot_general(
        xa, wqkv1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv1 = (qkv1 + bqkv1_ref[0].astype(jnp.float32)).astype(dtype)
    qkv2 = jax.lax.dot_general(
        ca, wqkv2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv2 = (qkv2 + bqkv2_ref[0].astype(jnp.float32)).astype(dtype)
    q1 = qkv1[:, :c_dim]
    k1 = qkv1[:, c_dim:2 * c_dim]
    v1 = qkv1[:, 2 * c_dim:]
    q2 = qkv2[:, :c_dim]
    k2 = qkv2[:, c_dim:2 * c_dim]
    v2 = qkv2[:, 2 * c_dim:]

    if joint_x:  # all images' x<-meta in one call per head group
        ax = _attn_rows(q1, k2, v2, scale_x, num_heads, head_dim, dtype,
                        mask=maskx_ref[:] if gx > 1 else None,
                        rowmask=jrowx_ref[:]).astype(dtype)
    if joint_c:
        ac = _attn_rows(q2, k1, v1, scale_c, num_heads, head_dim, dtype,
                        mask=maskc_ref[:] if gc > 1 else None,
                        rowmask=jrowc_ref[:]).astype(dtype)
    if not (joint_x and joint_c):
        x_rows, c_rows = [], []
        for r in range(rows):
            xs = slice(r * n, (r + 1) * n)
            cs = slice(r * m, (r + 1) * m)
            # x <- meta and meta <- x: both are head-group-batched cross
            # attentions (one pair of full-lane MXU dots per head group)
            if not joint_x:
                x_rows.append(_attn_rows(
                    q1[xs], k2[cs], v2[cs], scale_x, num_heads, head_dim,
                    dtype, mask=maskx_ref[:] if gx > 1 else None))
            if not joint_c:
                c_rows.append(_attn_rows(
                    q2[cs], k1[xs], v1[xs], scale_c, num_heads, head_dim,
                    dtype, mask=maskc_ref[:] if gc > 1 else None))
        if not joint_x:
            ax = (jnp.concatenate(x_rows, axis=0) if rows > 1
                  else x_rows[0]).astype(dtype)
        if not joint_c:
            ac = (jnp.concatenate(c_rows, axis=0) if rows > 1
                  else c_rows[0]).astype(dtype)

    ox = jax.lax.dot_general(ax, wpx_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    x1 = xflat.astype(jnp.float32) + ox + bpx_ref[0].astype(jnp.float32)
    xo = _mlp_residual(x1, w1_ref[:], b1_ref[0], w2_ref[:],
                       b2_ref[0], None, None, dtype, ew=ew)
    xo_ref[:] = xo.astype(dtype)

    oc = jax.lax.dot_general(ac, wpc_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    c1 = cflat.astype(jnp.float32) + oc + bpc_ref[0].astype(jnp.float32)
    co = _mlp_residual(c1, w1_ref[:], b1_ref[0], w2_ref[:],
                       b2_ref[0], None, None, dtype, ew=ew)
    co_ref[:] = co.astype(dtype)


def _dca_pick_rows(b: int, n: int, ch: int, hidden: int) -> int:
    # The old in-kernel fold reshape crashed Mosaic at ch in (192, 320) and
    # several fold sizes; with the fold moved outside the kernel (2D
    # blocking) only the VMEM budget bounds the fold.
    per_row = 2 * (2 * n * ch + 6 * n * ch + n * max(hidden, ch))
    budget = int(os.environ.get("PB_DCA_VMEM_MB", "9")) * 1024 * 1024
    for r in (8, 4, 2):
        if b % r == 0 and per_row * r < budget:
            return r
    return 1


@functools.partial(jax.jit,
                   static_argnames=("scale_x", "scale_c", "num_heads",
                                    "rows", "img_w"))
def _dca_rows_call(x, c, params, scale_x, scale_c, num_heads, rows,
                   cpe=None, img_w=0):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    row = lambda t: t.reshape(1, -1)
    (ln1s, ln1b, wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     ln2s, ln2b, w1, b1, w2, b2) = params
    if cpe is None:
        wcpe = jnp.zeros((9, ch), x.dtype)
        bcpe = jnp.zeros((1, ch), x.dtype)
    else:
        wcpe, bcpe = cpe[0], row(cpe[1])
    g = _pick_group(num_heads, d)
    gx = g
    gc = g if (_GROUP_ONLINE and g * n <= _MAX_BD_ROWS) else 1
    dummy = jnp.zeros((8, 128), x.dtype)
    # row-JOINT (see _rowjoint_mask): x<-meta keys are the m metas, so the
    # bd expansion is cheap for any rows; meta<-x keys are the n image
    # tokens — joint only while the expansion stays under the Mosaic row
    # ceiling (the x-direction is the iteration-count win either way)
    joint_x = _JOINT and _SHIFTLESS and rows > 1
    joint_c = (_JOINT and _SHIFTLESS and rows > 1
               and gc * rows * n <= _MAX_BD_ROWS)
    maskx = (_bd_mask(rows * m if joint_x else m, gx, d, x.dtype)
             if gx > 1 else dummy)
    maskc = (_bd_mask(rows * n if joint_c else n, gc, d, x.dtype)
             if gc > 1 else dummy)
    jrowx = (_rowjoint_mask(rows, n, m, gx, x.dtype) if joint_x else dummy)
    jrowc = (_rowjoint_mask(rows, m, n, gc, x.dtype) if joint_c else dummy)
    wqkv1_f, bqkv1_f = _fold_ln(ln1s, ln1b, wqkv1, bqkv1)
    wqkv2_f, bqkv2_f = _fold_ln(ln1s, ln1b, wqkv2, bqkv2)
    w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
    weights = [wqkv1_f, row(bqkv1_f), wqkv2_f, row(bqkv2_f),
               wpx, row(bpx), wpc, row(bpc),
               w1_f, row(b1_f), w2, row(b2), wcpe, bcpe, maskx, maskc,
               jrowx, jrowc]
    kernel = functools.partial(
        _dca_rows_kernel, scale_x=float(scale_x), scale_c=float(scale_c),
        num_heads=num_heads, head_dim=d, rows=rows, n=n, m=m, gx=gx, gc=gc,
        use_cpe=cpe is not None, img_w=img_w or 1,
        joint_x=joint_x, joint_c=joint_c)
    # fold OUTSIDE the kernel: 2D (B*N, C) views blocked (rows*N, C)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec = pl.BlockSpec((rows * n, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((rows * m, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    w_specs = _weight_specs([w.shape for w in weights])
    xo, co = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec] + w_specs,
        out_specs=[x_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x2.shape, x.dtype),
                   jax.ShapeDtypeStruct(c2.shape, c.dtype)],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x2, c2, *weights)
    return xo.reshape(x.shape), co.reshape(c.shape)


def _pick_tile(n: int, c: int = 0, hidden: int = 0) -> int:
    """Prefer the whole row in one tile when it fits VMEM: per-grid-step op
    overhead (~0.5us x ~16 ops) dominates at small tiles, and a single tile
    also collapses the online softmax to one pass."""
    if c:
        # rough VMEM bytes for the dca/s block at tile=n (bf16 activations)
        need = 2 * (2 * n * c + 3 * n * c + n * max(hidden, 4 * c)) \
            + n * c * 4
        if n <= 4096 and need < 10 * 1024 * 1024 and n % 8 == 0:
            return n
    if n <= 512 and n % 16 == 0:
        return n
    for tile in (512, 448, 256, 224, 128, 112):
        if n % tile == 0:
            return tile
    return 0


@functools.partial(jax.jit,
                   static_argnames=("scale_x", "scale_c", "num_heads",
                                    "img_w"))
def _dca_block_call(x, c, params, scale_x, scale_c, num_heads, cpe=None,
                    img_w=0):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    tile_n = _pick_tile(n, ch, params[12].shape[1])
    n_tiles = pl.cdiv(n, tile_n)
    row = lambda t: t.reshape(1, -1)
    (ln1s, ln1b, wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     ln2s, ln2b, w1, b1, w2, b2) = params
    if cpe is None:
        wcpe = jnp.zeros((9, ch), x.dtype)
        bcpe = jnp.zeros((1, ch), x.dtype)
    else:
        wcpe, bcpe = cpe[0], row(cpe[1])
    g = _pick_group(num_heads, d)
    gx = g                                     # x-dir: S = m (small)
    gc = g if (_GROUP_ONLINE and g * tile_n <= _MAX_BD_ROWS) else 1
    dummy = jnp.zeros((8, 128), x.dtype)
    maskx = _bd_mask(m, gx, d, x.dtype) if gx > 1 else dummy
    maskc = _bd_mask(tile_n, gc, d, x.dtype) if gc > 1 else dummy
    wqkv1_f, bqkv1_f = _fold_ln(ln1s, ln1b, wqkv1, bqkv1)
    wqkv2_f, bqkv2_f = _fold_ln(ln1s, ln1b, wqkv2, bqkv2)
    w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
    weights = [wqkv1_f, row(bqkv1_f), wqkv2_f, row(bqkv2_f),
               wpx, row(bpx), wpc, row(bpc),
               w1_f, row(b1_f), w2, row(b2), wcpe, bcpe, maskx, maskc]
    kernel = functools.partial(
        _dca_block_kernel, scale_x=float(scale_x), scale_c=float(scale_c),
        n_tiles=n_tiles, num_heads=num_heads, head_dim=d,
        use_cpe=cpe is not None, img_w=img_w or 1, gx=gx, gc=gc)
    x_spec = pl.BlockSpec((1, tile_n, ch), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m, ch), lambda bi, ti: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(w.shape, lambda bi, ti, s=w.shape:
                            tuple([0] * len(s)), memory_space=pltpu.VMEM)
               for w in weights]
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[x_spec, c_spec] + w_specs,
        out_specs=[x_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(c.shape, c.dtype)],
        scratch_shapes=[
            pltpu.VMEM((m, ch), x.dtype),     # q2
            pltpu.VMEM((m, ch), x.dtype),     # k2
            pltpu.VMEM((m, ch), x.dtype),     # v2
            pltpu.VMEM((m, num_heads), jnp.float32),  # running max
            pltpu.VMEM((m, ch), jnp.float32),         # l (lane-replicated)
            pltpu.VMEM((m, ch), jnp.float32),         # acc
        ],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x, c, *weights)


def dca_block(x, c, params, *, num_heads: int, scale_x: float,
              scale_c: float, cpe=None, img_w: int = 0
              ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused D-type LeMeBlock (pre-norm). params =
    (ln1_s, ln1_b, Wqkv1, bqkv1, Wqkv2, bqkv2, Wproj_x, bproj_x, Wproj_c,
    bproj_c, ln2_s, ln2_b, W1, b1, W2, b2). With cpe/img_w the 3x3 CPE
    fuses in (pass PRE-CPE tokens); requires the whole image in one tile."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    tile = _pick_tile(n, ch, params[12].shape[1])
    if c.shape[1] % 8 != 0 or ch % num_heads != 0 or tile == 0:
        return None
    if cpe is not None and tile != n:
        return None  # fused CPE needs the full image per tile
    if tile == n:
        rows = _dca_pick_rows(b, n, ch, params[12].shape[1])
        if rows > 1:
            return tuple(_dca_rows_call(x, c, tuple(params), scale_x,
                                        scale_c, num_heads, rows,
                                        cpe=cpe, img_w=img_w))
    return tuple(_dca_block_call(x, c, tuple(params), scale_x, scale_c,
                                 num_heads, cpe=cpe, img_w=img_w))


def _c_block_kernel(x_ref, c_ref,
                    wq_ref, bq_ref, wkv_ref, bkv_ref,
                    wp_ref, bp_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    wcpe_ref, bcpe_ref, maskc_ref,
                    co_ref,
                    q_scr, m_scr, l_scr, acc_scr,
                    *, scale: float, n_tiles: int, num_heads: int,
                    head_dim: int, use_cpe: bool, img_w: int, gc: int):
    """Meta-token init ("C") block: only c is produced; x streams once and
    is never written (ref lemevit.py:584-613)."""
    t = pl.program_id(1)
    dtype = x_ref.dtype
    ew = dtype if _EW else jnp.float32
    c_dim = x_ref.shape[-1]
    # LN affines pre-folded into wq/wkv/w1 (see _fold_ln)

    @pl.when(t == 0)
    def _():
        ca = _ln(c_ref[0], None, None, ew=ew).astype(dtype)
        q = jax.lax.dot_general(ca, wq_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q_scr[:] = (q + bq_ref[0].astype(jnp.float32)).astype(dtype)
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    xt = x_ref[0]
    if use_cpe:
        xt = _cpe_flat(xt, wcpe_ref[:], bcpe_ref[0],
                       xt.shape[0] // img_w, img_w)
    xa = _ln(xt, None, None, ew=ew).astype(dtype)
    kv = jax.lax.dot_general(xa, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[0].astype(jnp.float32)).astype(dtype)
    k = kv[:, :c_dim]
    v = kv[:, c_dim:]

    # online softmax over the N tiles (head-group-batched joint softmax:
    # measured win for this kernel's thin 16-row query on v5e)
    _online_attn(q_scr[:], k, v, scale, num_heads, head_dim,
                 m_scr, l_scr, acc_scr, dtype,
                 mask=maskc_ref[:] if gc > 1 else None)

    @pl.when(t == n_tiles - 1)
    def _():
        attn_c = acc_scr[:] / l_scr[:]
        oc = jax.lax.dot_general(
            attn_c.astype(dtype), wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        c1 = c_ref[0].astype(jnp.float32) + oc + bp_ref[0].astype(
            jnp.float32)
        co = _mlp_residual(c1, w1_ref[:], b1_ref[0],
                           w2_ref[:], b2_ref[0], None, None,
                           dtype, ew=ew)
        co_ref[0] = co.astype(dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "num_heads", "img_w"))
def _c_block_call(x, c, params, scale, num_heads, cpe=None, img_w=0):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    # whole-row tiles when VMEM allows (the C kernel only holds x + kv on
    # the image side, so 2*ch is the honest hidden width): enables fused
    # CPE and collapses the grid to one step per image
    tile_n = _pick_tile(n, ch, 2 * ch)
    n_tiles = pl.cdiv(n, tile_n)
    row = lambda t: t.reshape(1, -1)
    (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
     w1, b1, w2, b2) = params
    if cpe is None:
        wcpe = jnp.zeros((9, ch), x.dtype)
        bcpe = jnp.zeros((1, ch), x.dtype)
    else:
        wcpe, bcpe = cpe[0], row(cpe[1])
    g = _pick_group(num_heads, d)
    gc = g if (_GROUP_ONLINE and g * tile_n <= _MAX_BD_ROWS) else 1
    maskc = (_bd_mask(tile_n, gc, d, x.dtype) if gc > 1
             else jnp.zeros((8, 128), x.dtype))
    wq_f, bq_f = _fold_ln(ln1s, ln1b, wq, bq)
    wkv_f, bkv_f = _fold_ln(ln1s, ln1b, wkv, bkv)
    w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
    weights = [wq_f, row(bq_f), wkv_f, row(bkv_f),
               wp, row(bp), w1_f, row(b1_f), w2, row(b2),
               wcpe, bcpe, maskc]
    kernel = functools.partial(_c_block_kernel, scale=float(scale),
                               n_tiles=n_tiles, num_heads=num_heads,
                               head_dim=d, use_cpe=cpe is not None,
                               img_w=img_w or 1, gc=gc)
    x_spec = pl.BlockSpec((1, tile_n, ch), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, m, ch), lambda bi, ti: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(w.shape, lambda bi, ti, s=w.shape:
                            tuple([0] * len(s)), memory_space=pltpu.VMEM)
               for w in weights]
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[x_spec, c_spec] + w_specs,
        out_specs=[c_spec],
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype)],
        scratch_shapes=[
            pltpu.VMEM((m, ch), x.dtype),             # q
            pltpu.VMEM((m, num_heads), jnp.float32),  # running max
            pltpu.VMEM((m, ch), jnp.float32),         # l (lane-replicated)
            pltpu.VMEM((m, ch), jnp.float32),         # acc
        ],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x, c, *weights)[0]


def c_block(x, c, params, *, num_heads: int, cpe=None, img_w: int = 0
            ) -> Optional[jax.Array]:
    """Fused C-type LeMeBlock: returns the new c only. params =
    (ln1_s, ln1_b, Wq, bq, Wkv, bkv, Wproj, bproj, ln2_s, ln2_b,
    W1, b1, W2, b2). cpe as in dca_block (pass PRE-CPE tokens)."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    d = ch // num_heads
    tile = _pick_tile(n, ch, 2 * ch)
    if c.shape[1] % 8 != 0 or ch % num_heads != 0 or tile == 0:
        return None
    if cpe is not None and tile != n:
        return None
    scale = d ** -0.5
    if (tile == n and _pick_rows_c(b, n, ch) > 1
            and os.environ.get("PB_C_ROWS", "1") != "0"):
        # whole-image tiles + batch-row folding: one grid step covers
        # several images, amortizing the ~0.5us-per-op step overhead
        # that dominates the one-image-per-step online kernel
        return _c_rows_call(x, c, tuple(params), scale, num_heads,
                            cpe=cpe, img_w=img_w)
    return _c_block_call(x, c, tuple(params), scale, num_heads, cpe=cpe,
                         img_w=img_w)


def s_block(x, c, params, *, num_heads: int, cpe=None, img_w: int = 0
            ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused S-type LeMeBlock. x (B,N,C) tokens, c (B,M,C); params =
    (ln1_scale, ln1_bias, Wqkv, bqkv, Wproj, bproj, ln2_scale, ln2_bias,
    W1, b1, W2, b2). With cpe=((9,C) taps, (C,) bias) and img_w, the 3x3
    depthwise position embedding fuses in too (pass PRE-CPE tokens then).
    Returns None if shapes don't qualify."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    d = ch // num_heads
    if n > _MAX_N_SBLOCK or ch % num_heads != 0 or c.shape[1] % 8 != 0:
        return None
    scale = d ** -0.5
    return tuple(_s_block_call(x, c, tuple(params), scale, num_heads,
                               cpe=cpe, img_w=img_w))


# ---------------------------------------------------------------------------
# Stage-fused S kernel: an ENTIRE stage of S blocks in one pallas_call.
# Grid (B-folds, n_blocks), block index fastest: per-block weights stream
# through VMEM double-buffered (prefetch of block j+1 overlaps compute of
# block j), while x/c live in the REVISITED output buffers across block
# steps — activations cross HBM once per stage instead of once per block
# (stage 3 of base re-read a 38 MB x tensor 18 times before this).
# ---------------------------------------------------------------------------


def _s_stage_kernel(x_ref, c_ref,
                    wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref,
                    wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                    jrowx_ref, jrowc_ref,
                    xo_ref, co_ref, xs_ref, cs_ref, *,
                    scale: float, num_heads: int, head_dim: int,
                    rows: int, n: int, m: int, use_cpe: bool,
                    img_w: int, g: int, joint_x: bool, joint_c: bool,
                    n_blocks: int):
    blk = pl.program_id(1)

    # block 0 copies the HBM inputs into persistent VMEM scratch; the
    # chain then lives entirely in scratch (zero HBM traffic between
    # blocks) and only the final block's result goes to the outputs
    @pl.when(blk == 0)
    def _load():
        xs_ref[:] = x_ref[:]
        cs_ref[:] = c_ref[:]

    xin = xs_ref[:]
    if use_cpe:
        xin = _cpe_flat(xin, wcpe_ref[0], bcpe_ref[0, 0],
                        n // img_w, img_w)
    xo, co = _s_body(
        xin, cs_ref[:],
        wqkv_ref[:], bqkv_ref[0, 0], wp_ref[:], bp_ref[0, 0],
        w1_ref[:], b1_ref[0, 0], w2_ref[:], b2_ref[0, 0],
        maskx_ref[:] if g > 1 else None,
        maskc_ref[:] if g > 1 else None,
        jrowx_ref[:] if joint_x else None,
        jrowc_ref[:] if joint_c else None,
        scale=scale, num_heads=num_heads, head_dim=head_dim, rows=rows,
        n=n, m=m, g=g, joint_x=joint_x, joint_c=joint_c,
        dtype=x_ref.dtype)
    xs_ref[:] = xo
    cs_ref[:] = co

    @pl.when(blk == n_blocks - 1)
    def _store():
        xo_ref[:] = xs_ref[:]
        co_ref[:] = cs_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("scale", "num_heads", "img_w",
                                    "use_cpe"))
def _s_stage_call(x, c, stacked, cpe_taps, cpe_bias, scale, num_heads,
                  img_w, use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wqkv, bqkv, wp, bp, w1, b1, w2, b2) = stacked
    nb = wqkv.shape[0]
    hidden = w1.shape[2]
    rows = _pick_rows(b, n, ch, hidden)
    g = _pick_group(num_heads, d)
    dummy = jnp.zeros((8, 128), x.dtype)
    joint_c = (_JOINT and _SHIFTLESS and rows > 1
               and g * rows * m <= _MAX_BD_ROWS)
    joint_x = (_JOINT and _SHIFTLESS and rows > 1 and rows * n <= 512
               and g * rows * n <= _MAX_BD_ROWS)
    maskx = (_bd_mask(rows * n if joint_x else n, g, d, x.dtype)
             if g > 1 else dummy)
    maskc = (_bd_mask(rows * m if joint_c else m, g, d, x.dtype)
             if g > 1 else dummy)
    jrowx = (_rowjoint_mask(rows, n, n, g, x.dtype) if joint_x else dummy)
    jrowc = (_rowjoint_mask(rows, m, m, g, x.dtype) if joint_c else dummy)
    if cpe_taps is None:
        cpe_taps = jnp.zeros((nb, 9, ch), x.dtype)
        cpe_bias = jnp.zeros((nb, ch), x.dtype)
    # Per-block MATRICES stream as flat-2D row-stacked arrays with true
    # (rows, cols) blocks — a 3D (1, C, 3C) block forces a per-step
    # Mosaic relayout of every weight (measured 8x step cost). Per-block
    # VECTORS ride as (NB, 8, dim): the (1, 8, dim) block satisfies the
    # last-two-dims rule and indexes as ref[0, 0].
    wqkv, wp, w1, w2 = (t.reshape(-1, t.shape[-1])
                        for t in (wqkv, wp, w1, w2))
    bqkv, bp, b1, b2, cpe_bias = (
        jnp.repeat(t[:, None, :], 8, axis=1)
        for t in (bqkv, bp, b1, b2, cpe_bias))
    mats = [wqkv, bqkv, wp, bp, w1, b1, w2, b2, cpe_taps, cpe_bias]
    per_block = mats
    shared = [maskx, maskc, jrowx, jrowc]

    def pb_spec(w):
        if w.ndim == 2:  # flat-stacked matrix: rows-per-block slice
            rows_blk = w.shape[0] // nb
            return pl.BlockSpec((rows_blk, w.shape[1]),
                                lambda bi, blk: (blk, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1,) + w.shape[1:],
                            lambda bi, blk, nd=w.ndim: (blk,) + (0,) * (
                                nd - 1),
                            memory_space=pltpu.VMEM)

    pb_specs = [pb_spec(w) for w in per_block]
    sh_specs = [pl.BlockSpec(w.shape,
                             lambda bi, blk, nd=w.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM) for w in shared]
    kernel = functools.partial(_s_stage_kernel, scale=float(scale),
                               num_heads=num_heads, head_dim=d,
                               rows=rows, n=n, m=m,
                               use_cpe=use_cpe, img_w=img_w or 1,
                               g=g, joint_x=joint_x, joint_c=joint_c,
                               n_blocks=nb)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec = pl.BlockSpec((rows * n, ch), lambda bi, blk: (bi, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((rows * m, ch), lambda bi, blk: (bi, 0),
                          memory_space=pltpu.VMEM)
    xo, co = pl.pallas_call(
        kernel,
        grid=(b // rows, nb),
        in_specs=[x_spec, c_spec] + pb_specs + sh_specs,
        out_specs=[x_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(x2.shape, x.dtype),
                   jax.ShapeDtypeStruct(c2.shape, c.dtype)],
        scratch_shapes=[pltpu.VMEM((rows * n, ch), x.dtype),
                        pltpu.VMEM((rows * m, ch), x.dtype)],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x2, c2, *per_block, *shared)
    return xo.reshape(x.shape), co.reshape(c.shape)


def s_stage(x, c, params_list, *, num_heads: int, cpes=None,
            img_w: int = 0) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused S-type STAGE: params_list is one 12-tuple per block (the
    s_block layout: ln1_s, ln1_b, Wqkv, bqkv, Wp, bp, ln2_s, ln2_b, W1,
    b1, W2, b2); cpes one ((9,C), (C,)) pair per block or None (then
    pass PRE-CPE x only if cpes is given). All blocks must share shapes
    (they do within a stage). Returns None if shapes don't qualify."""
    if not HAS_PLTPU or len(params_list) < 2:
        return None
    b, n, ch = x.shape
    d = ch // num_heads
    if n > _MAX_N_SBLOCK or ch % num_heads != 0 or c.shape[1] % 8 != 0:
        return None
    if cpes is not None and any(cp is None for cp in cpes):
        return None
    folded = []
    for p in params_list:
        (ln1s, ln1b, wqkv, bqkv, wp, bp, ln2s, ln2b, w1, b1, w2, b2) = p
        wqkv_f, bqkv_f = _fold_ln(ln1s, ln1b, wqkv, bqkv)
        w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
        folded.append((wqkv_f, bqkv_f, wp, bp, w1_f, b1_f, w2, b2))
    stacked = tuple(jnp.stack([f[i] for f in folded])
                    for i in range(8))
    if cpes is not None:
        cpe_taps = jnp.stack([cp[0] for cp in cpes]).astype(x.dtype)
        cpe_bias = jnp.stack([cp[1] for cp in cpes]).astype(x.dtype)
    else:
        cpe_taps = cpe_bias = None
    scale = d ** -0.5
    return tuple(_s_stage_call(x, c, stacked, cpe_taps, cpe_bias, scale,
                               num_heads, img_w, cpes is not None))


# ---------------------------------------------------------------------------
# Rows-folded C kernel: multiple images per grid step. The online-softmax
# tiled kernel above processes ONE image per step — at stage-0 scale that
# is 256 grid steps whose per-step overhead dominates (the whole block is
# ~10x off roofline). When the image fits one tile anyway (the common
# case under the raised VMEM limit), fold r images per step like the S
# kernel does and skip the online carry entirely.
# ---------------------------------------------------------------------------


def _pick_rows_c(b: int, n: int, ch: int) -> int:
    """Batch rows per grid step for the folded C kernel (lane-padded)."""
    per_row = 2 * (2 * n * -(-ch // 128) * 128            # x double-buffered
                   + n * -(-2 * ch // 128) * 128          # kv transient
                   + n * -(-ch // 128) * 128)             # xa / f32 peak
    budget = int(os.environ.get("PB_C_VMEM_MB", "9")) * 1024 * 1024
    for r in (16, 8, 4, 2):
        if b % r == 0 and (r * n) % 8 == 0 and per_row * r < budget:
            return r
    return 1


def _c_rows_kernel(x_ref, c_ref,
                   wq_ref, bq_ref, wkv_ref, bkv_ref,
                   wp_ref, bp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   wcpe_ref, bcpe_ref, maskc_ref,
                   co_ref, *,
                   scale: float, num_heads: int, head_dim: int,
                   rows: int, n: int, m: int, use_cpe: bool,
                   img_w: int, g: int):
    dtype = x_ref.dtype
    ew = dtype if _EW else jnp.float32
    c_dim = x_ref.shape[-1]
    xflat = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    xa = _ln(xflat, None, None, ew=ew).astype(dtype)
    kv = jax.lax.dot_general(xa, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[0].astype(jnp.float32)).astype(dtype)
    ca = _ln(c_ref[:], None, None, ew=ew).astype(dtype)
    q = jax.lax.dot_general(ca, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    q = (q + bq_ref[0].astype(jnp.float32)).astype(dtype)
    o = _attn_dir_inf(q, kv[:, :c_dim], kv[:, c_dim:], rows, m, n,
                      scale, num_heads, head_dim, g,
                      maskc_ref[:] if g > 1 else None, dtype)
    o = jax.lax.dot_general(o, wp_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    c1 = c_ref[:].astype(jnp.float32) + o + bp_ref[0].astype(jnp.float32)
    co_ref[:] = _mlp_residual(c1, w1_ref[:], b1_ref[0], w2_ref[:],
                              b2_ref[0], None, None, dtype,
                              ew=ew).astype(dtype)


def _attn_dir_inf(q, k, v, rows, sq, sk, scale, num_heads, head_dim, g,
                  mask, dtype):
    """Per-(row, head-group) attention on folded images (thin query)."""
    outs = []
    for r in range(rows):
        qs = slice(r * sq, (r + 1) * sq)
        ks = slice(r * sk, (r + 1) * sk)
        row_outs = []
        for h0 in range(0, num_heads, g):
            gs = slice(h0 * head_dim, (h0 + g) * head_dim)
            row_outs.append(_attn_rows(q[qs, gs], k[ks, gs], v[ks, gs],
                                       scale, g, head_dim, dtype,
                                       mask=mask))
        outs.append(jnp.concatenate(row_outs, axis=1)
                    if len(row_outs) > 1 else row_outs[0])
    return (jnp.concatenate(outs, axis=0) if rows > 1
            else outs[0]).astype(dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "num_heads", "img_w"))
def _c_rows_call(x, c, params, scale, num_heads, cpe=None, img_w=0):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    rows = _pick_rows_c(b, n, ch)
    row = lambda t: t.reshape(1, -1)
    (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
     w1, b1, w2, b2) = params
    if cpe is None:
        wcpe = jnp.zeros((9, ch), x.dtype)
        bcpe = jnp.zeros((1, ch), x.dtype)
    else:
        wcpe, bcpe = cpe[0], row(cpe[1])
    g = _pick_group(num_heads, d)
    if g * n > _MAX_BD_ROWS:  # thin-query bd expansion is key-side
        g = 1
    maskc = (_bd_mask(n, g, d, x.dtype) if g > 1
             else jnp.zeros((8, 128), x.dtype))
    wq_f, bq_f = _fold_ln(ln1s, ln1b, wq, bq)
    wkv_f, bkv_f = _fold_ln(ln1s, ln1b, wkv, bkv)
    w1_f, b1_f = _fold_ln(ln2s, ln2b, w1, b1)
    weights = [wq_f, row(bq_f), wkv_f, row(bkv_f),
               wp, row(bp), w1_f, row(b1_f), w2, row(b2),
               wcpe, bcpe, maskc]
    kernel = functools.partial(_c_rows_kernel, scale=float(scale),
                               num_heads=num_heads, head_dim=d,
                               rows=rows, n=n, m=m,
                               use_cpe=cpe is not None,
                               img_w=img_w or 1, g=g)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec = pl.BlockSpec((rows * n, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((rows * m, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    w_specs = _weight_specs([w.shape for w in weights])
    co = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec] + w_specs,
        out_specs=[c_spec],
        out_shape=[jax.ShapeDtypeStruct(c2.shape, c.dtype)],
        interpret=_INTERPRET,
        **vmem_params(),
    )(x2, c2, *weights)[0]
    return co.reshape(c.shape)
