"""Fused LeMeBlock TRAINING kernels (forward + backward).

The inference kernels in pallas_block.py are deterministic-only; training
fell back to the unfused XLA composition, whose backward re-reads the
(B,N,C) activations ~16x per block and (with stage remat) re-runs the
forward — measured 4.2x the forward cost on v5e. These kernels close the
gap the TPU way:

- forward: the same whole-block fused layout as inference, plus exact
  per-sample DropPath via branch-scale columns (timm semantics: the
  residual branch output, including the projection bias, is scaled by
  keep_mask / keep_prob per sample — ref models/lemevit.py:615-650 with
  timm DropPath). The forward ALSO writes t1 (the post-attention
  residual) per branch: backward then never re-runs attention to reach
  the MLP — one extra (N, C) HBM stream per branch buys a backward that
  fits VMEM.
- backward: TWO lean Pallas kernels per block (a fused single-kernel
  backward was measured at 31MB of scoped VMEM vs the 16MB/core budget —
  weights + recompute transients + double-buffered outputs don't coexist):
    B1 `_mlp_bwd`: t1 + upstream grad -> dt1, recomputing only the MLP
       (shared by the S and D blocks — the MLP is weight-shared across
       both token streams in the architecture).
    B2 `_s/_dca_attn_bwd`: block inputs + dt1 -> dx, dc, recomputing
       LN/qkv/attention in VMEM. dq/dk/dv/o are written straight into
       output-ref slices per (row, head-group) — no concat temporaries —
       and scores are recomputed in the same scope as their grads; this
       liveness trim plus the output-set cuts below is what fits
       base-stage3 (C=384, N=196) under the 16 MB scoped-VMEM limit
       (the round-2 shape that compile-crashed at 17.16 MB).
  Weight grads accumulate IN-KERNEL into fp32 resident output blocks
  (constant index map, zero-init at grid step 0): the round-2 design
  dumped the (activation, grad) pairs — dqkv, o_att, m, dz — to HBM
  and contracted them in XLA, and that weight-grad pass measured 55%
  of the stage-1 block backward (13.7 of 24.9 ms: the XLA pass
  materializes (T, hidden) intermediates at multi-GB scale). Now the
  wide streams (dqkv, o_att, dkv) live only in VMEM scratch; the per
  -tile fp32 accumulator blocks cost ~2-7 MB and replace GBs of HBM
  round trips. Bias grads whose operand is XLA-visible stay outside:
  dbp = colsum(droppath-scale * dt1) and db2 = colsum(dz). The data
  grad is still emitted PRE-CPE-transpose (the flipped-tap window
  product is one fused XLA pass).

Backward row folds are picked by explicit byte models
(_pick_rows_bwd_mlp / _pick_rows_bwd_attn) that return 0 — XLA
fallback — when no Mosaic-aligned fold fits the VMEM budget; there is
NO alignment-forced over-budget fallback on the backward path
(tests/test_train_compile.py compiles the flagship shapes on real TPU
as the ground-truth gate).

custom_vjp boundary: the kernels take LN-FOLDED weights (pallas_block.
_fold_ln); the fold runs OUTSIDE the boundary so XLA autodiff chains the
LN scale/bias grads through it for free. Same for the 3x3 CPE taps:
tap grads via an XLA window-product on the dumped pre-transpose grad.

DropPath scale grads are returned as zeros: the scales derive from
Bernoulli masks and are never differentiated.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lemevit_tpu.attn.pallas_block import (
    HAS_PLTPU, _MAX_N_SBLOCK, _NEG_CLIP, _POS_CLIP, _bd_mask, _bd_tile,
    _cpe_flat, _cpe_tap_grads_flat, _gelu, _ln, _pick_group, _ERF_TANH_P,
)
from lemevit_tpu.attn import pallas_block as _pb

if HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _ln_bwd(dm, t):
    """Backward of the scale/bias-free LayerNorm: dm is the fp32 grad
    w.r.t. t_hat = (t - mu) / sigma; stats recomputed from t (fp32)."""
    t32 = t.astype(jnp.float32)
    mu = jnp.mean(t32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    th = (t32 - mu) * inv
    mdm = jnp.mean(dm, axis=-1, keepdims=True)
    mdt = jnp.mean(dm * th, axis=-1, keepdims=True)
    return inv * (dm - mdm - th * mdt)


def _gelu_grad(y, fast):
    """d gelu / dy in fp32. fast=True differentiates the tanh-erf form the
    bf16 forward actually computes; fast=False uses the analytic exact
    form (matches the erf-poly forward to ~1e-5)."""
    y32 = y.astype(jnp.float32)
    if fast:
        p1, p3, p5 = (jnp.float32(v) for v in _ERF_TANH_P)
        tt_raw = y32 * jnp.float32(_INV_SQRT2)
        tt = jnp.clip(tt_raw, -6.0, 6.0)
        u = tt * tt
        e = jnp.tanh(tt * (p1 + u * (p3 + u * p5)))
        inner = (p1 + u * (3.0 * p3 + u * (5.0 * p5)))
        dtt = jnp.where(jnp.abs(tt_raw) < 6.0, jnp.float32(_INV_SQRT2), 0.0)
        return 0.5 * (1.0 + e) + 0.5 * y32 * (1.0 - e * e) * inner * dtt
    erf = _pb._erf(y32 * jnp.float32(_INV_SQRT2))
    return (0.5 * (1.0 + erf)
            + y32 * jnp.exp(-0.5 * y32 * y32) * jnp.float32(_INV_SQRT2PI))


def _dp_cols(dp_ref, idx, rows, seq):
    """Expand per-image DropPath scales to an (rows*seq, 1) fp32 column
    (image r of this grid step occupies flat rows [r*seq, (r+1)*seq)).
    dp_ref is the WHOLE (4, B) table in SMEM; the image index is
    program_id(0)*rows + r (scalar SMEM loads support dynamic indices)."""
    pid = pl.program_id(0)
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows * seq, 1), 0) // seq
    acc = jnp.zeros((rows * seq, 1), jnp.float32)
    for r in range(rows):
        acc = acc + jnp.where(rid == r, dp_ref[idx, pid * rows + r], 0.0)
    return acc


def _attn_fwd_group(q, k, v, scale, head_dim, mask):
    """One head-group attention on a single image: returns (o, p, lb).
    q (S_q, g*d), k/v (S_k, g*d); mask (g*S_k, g*d) or None (g == 1)."""
    g = 1 if mask is None else mask.shape[1] // head_dim
    if g == 1:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.clip(s, _NEG_CLIP, _POS_CLIP))
        lb = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / lb
        return o, p, lb
    kbd = _bd_tile(k, g, mask)
    vbd = _bd_tile(v, g, mask)
    s = jax.lax.dot_general(q, kbd, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(jnp.clip(s, _NEG_CLIP, _POS_CLIP))
    pv = p.astype(v.dtype)
    lb = jax.lax.dot_general(pv, mask, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(pv, vbd, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / lb
    return o, p, lb


def _attn_grp_bwd(do, q, k, v, scale, head_dim, mask):
    """One head-group attention backward on a single image, recomputing
    the scores in-scope (shared liveness with the grads): do (S_q, g*d)
    fp32 -> (o fp32, dq, dk, dv fp32 compact (S, g*d) layouts). o is
    returned for dumping (the projection-weight einsum runs in XLA)."""
    g = 1 if mask is None else mask.shape[1] // head_dim
    dt = v.dtype
    if g == 1:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.clip(s, _NEG_CLIP, _POS_CLIP))
        lb = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(dt), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / lb
        dnum = do / lb
        dp_ = jax.lax.dot_general(dnum.astype(dt), v,
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dlb = -jnp.sum(do * o, axis=1, keepdims=True) / lb
        dp_ = dp_ + dlb  # broadcast over keys
        dsv = (dp_ * p * scale).astype(dt)
        dq = jax.lax.dot_general(dsv, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsv, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p.astype(dt), dnum.astype(dt),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return o, dq, dk, dv
    kbd = _bd_tile(k, g, mask)
    vbd = _bd_tile(v, g, mask)
    s = jax.lax.dot_general(q, kbd, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(jnp.clip(s, _NEG_CLIP, _POS_CLIP))
    pv = p.astype(dt)
    lb = jax.lax.dot_general(pv, mask, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(pv, vbd, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / lb
    dnum = (do / lb).astype(dt)
    # dlb replicated per head block -> redistribute to key copies via mask^T
    dlb = ((-do * o) / lb).astype(dt)
    dp_ = jax.lax.dot_general(dnum, vbd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) \
        + jax.lax.dot_general(dlb, mask, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ds = (dp_ * p * scale).astype(dt)
    dq = jax.lax.dot_general(ds, kbd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dkbd = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dvbd = jax.lax.dot_general(pv, dnum, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # fold the g block-diagonal copies back to the compact (S, g*d) layout
    skeys = k.shape[0]
    m32 = mask.astype(jnp.float32)
    dk = sum((dkbd * m32)[j * skeys:(j + 1) * skeys] for j in range(g))
    dv = sum((dvbd * m32)[j * skeys:(j + 1) * skeys] for j in range(g))
    return o, dq, dk, dv


def _pick_rows_train(b, n, ch, hidden, m=16):
    """FORWARD-kernel batch rows per grid step. Mosaic requires the
    block's sublane dim (rows*n and rows*m) divisible by 8, so alignment
    can force a larger fold than the VMEM budget prefers; the forced
    minimum is retained here because the fused forwards have compiled at
    every flagship shape including the forced fold (round-2 on-chip
    evidence). The BACKWARD pickers below are budget-strict instead —
    the round-2 stage-3 scoped-VMEM OOM came from this fallback being
    applied to the backward. Returns 0 when no aligned fold divides the
    batch."""
    per_row = 6 * n * max(hidden, 3 * ch) * 2
    budget = int(os.environ.get("PB_TRAIN_VMEM_MB", "8")) * 1024 * 1024
    ok = lambda r: (b % r == 0 and (r * n) % 8 == 0 and (r * m) % 8 == 0)
    for r in (16, 8, 4, 2, 1):
        if ok(r) and per_row * r < budget:
            return r
    for r in (1, 2, 4, 8, 16):  # alignment-forced minimum
        if ok(r):
            return r
    return 0


def _aligned_folds(b, n, m):
    """Row folds satisfying Mosaic's sublane alignment, largest first."""
    return [r for r in (16, 8, 4, 2, 1)
            if b % r == 0 and (r * n) % 8 == 0 and (r * m) % 8 == 0]


# The backward limits the c-direction's block-diagonal key expansion to
# much shorter keys than the forward: the expansion (plus its fp32 grads
# and fold-back) costs ~12 B x gc^2 x n x d of liveness, which at DCA
# stage-2 scale (n=784, g=3) is ~3.7 MB — the per-head loop is VMEM-free
# and the c-direction is thin (16 queries), so the MXU win doesn't pay.
_BWD_BD_ROWS = 1024


def _compiler_params():
    """Raised per-kernel VMEM limit (see pallas_block.vmem_params)."""
    return _pb.vmem_params()


def _bwd_budget():
    """Scoped-VMEM budget for the backward kernels (bytes). The compile
    ceiling is the per-kernel vmem_limit_bytes (PB_VMEM_LIMIT_MB, default
    64 — see pallas_block.vmem_params); the default budget of 36 MB is
    the measured sweet spot on v5e (train_kbench: admits the stage-1 DCA
    and stage-4 S backwards, which beat XLA by 26%/34%, with no
    regression at the stages that already fit under 14.5). STRICT: the
    pickers below return 0 (XLA fallback) instead of shipping an
    over-budget fold — the round-2 base@bs256 compile crash (17.16 MB at
    stage3, under the old 16 MB ceiling) is the case this guards."""
    return float(os.environ.get("PB_TRAIN_BWD_MB", "36")) * 1024 * 1024


def _lanes(c):
    """VMEM buffers tile the lane (minor) dim to multiples of 128 — a
    (N, 64) buffer COSTS (N, 128). Every byte model below must size
    buffers at the padded width (measured: tiny stage1 ch=64 kernels ran
    2x over the unpadded estimate)."""
    return -(-c // 128) * 128


def _pick_bt_mlp(total_rows, ch, hidden):
    """B1 (`_mlp_bwd_kernel`) flat-token tile size. The MLP backward is
    POINTWISE across tokens (LN is over channels), so its blocks need no
    image alignment — any 8-aligned tile dividing the flat (B*seq) row
    count works, and the tile shrinks freely until the (tile, hidden)
    fp32 recompute transients fit the budget (the round-2-era image-
    aligned fold OOM'd at 21 MB for stage-1-scale single images).
    Returns 0 when nothing fits (XLA fallback)."""
    budget = _bwd_budget()
    cp, hp = _lanes(ch), _lanes(hidden)
    w = 2 * (2 * ch * hidden)  # w1 + w2, bf16
    acc = 4 * (ch * hp + 8 * hp + hidden * cp)  # resident fp32 dW blocks
    for bt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if total_rows % bt:
            continue
        io = 2 * 2 * 4 * bt * cp        # t1, dout, dzv in; dt1 out
        trans = bt * (16 * hp + 16 * cp)  # + gg bf16 vs the old model
        if w + acc + io + trans <= budget:
            return bt
    return 0


def _pick_rows_bwd_mlp(b, n, ch, hidden, m=16):
    """Gate twin of _pick_bt_mlp for the block-level qualify check: both
    token streams must have a workable tile."""
    if _pick_bt_mlp(b * n, ch, hidden) and _pick_bt_mlp(b * m, ch, hidden):
        return 1
    return 0


def _pick_rows_bwd_attn(b, n, ch, m, num_heads, dca=False):
    """B2 (attention-backward) row fold via an explicit byte model.
    IO: 7 double-buffered bf16 blocks per token stream (in: t, dt1;
    out: dtgrad, dqkv[3ch], oatt). Transients: qkv + doatt + dt1 +
    ln-backward peak ~22*ch bytes/token (dq/dk/dv/o are written straight
    into output-ref slices — no concat temporaries). Scores: ~3 live
    fp32 (S_q, g*S_k) mats per (row, group) step, plus the
    block-diagonal key/value expansions (bf16 fwd + fp32 grads) on
    whichever direction uses g>1 over long keys."""
    budget = _bwd_budget()
    d = ch // num_heads
    cp, cp3 = _lanes(ch), _lanes(3 * ch)
    g = _pick_group(num_heads, d)
    if dca:
        gx = g
        gc = g if g * n <= _BWD_BD_ROWS else 1
        w = 2 * (2 * 3 * ch * ch + 2 * ch * ch)
        masks = 2 * (gx * m * _lanes(gx * d) + gc * n * _lanes(gc * d))
        # ~3 live fp32 (S_q, lanes(g*S_k)) score mats per group step
        scores = 12 * (n * _lanes(gx * m) + m * _lanes(gc * n))
        # block-diagonal k/v expansions: bf16 fwd + fp32 grads ~ 12 B/elem
        bdexp = 12 * (gx * m * _lanes(gx * d) + gc * n * _lanes(gc * d))
        # resident fp32 weight-grad blocks: 2x (dWqkv + dbqkv) + 2x dWp
        acc = 4 * (2 * (ch * cp3 + 8 * cp3) + 2 * ch * cp)
    else:
        w = 2 * (3 * ch * ch + ch * ch)
        masks = 2 * (g * n + g * m) * _lanes(g * d)
        scores = 12 * (n * _lanes(g * n) + m * _lanes(g * m))
        bdexp = 12 * (g * n + g * m) * _lanes(g * d)
        acc = 4 * (ch * cp3 + 8 * cp3 + ch * cp)
    for r in _aligned_folds(b, n, m):
        t = r * (n + m)
        io = 2 * 2 * t * 3 * cp           # x, dt1 in; dtgrad out
        scratch = 2 * t * (cp3 + cp)      # dqkv + oatt, single-buffered
        trans = t * 22 * cp
        if (w + masks + scores + bdexp + acc + io + scratch
                + trans <= budget):
            return r
    return 0


def _wspec(shapes):
    return [pl.BlockSpec(s, lambda bi, s_=s: tuple([0] * len(s_)),
                         memory_space=pltpu.VMEM) for s in shapes]


def _row(t):
    return t.reshape(1, -1)


# ---------------------------------------------------------------------------
# Forward kernels (S and D) — also emit t1 per branch for the backward
# ---------------------------------------------------------------------------

def _attn_dir(q, k, v, rows, sq, sk, scale, num_heads, head_dim, g, mask,
              dtype):
    """Per-(row, head-group) loop attention: q (rows*sq, C) x k/v
    (rows*sk, C) -> (rows*sq, C)."""
    outs = []
    for r in range(rows):
        qs = slice(r * sq, (r + 1) * sq)
        ks = slice(r * sk, (r + 1) * sk)
        row_outs = []
        for h0 in range(0, num_heads, g):
            gs = slice(h0 * head_dim, (h0 + g) * head_dim)
            o, _, _ = _attn_fwd_group(q[qs, gs], k[ks, gs], v[ks, gs],
                                      scale, head_dim, mask)
            row_outs.append(o)
        outs.append(jnp.concatenate(row_outs, axis=1)
                    if len(row_outs) > 1 else row_outs[0])
    return (jnp.concatenate(outs, axis=0) if rows > 1
            else outs[0]).astype(dtype)


def _mlp_fwd(t1, s2, w1, b1, w2, b2, dtype):
    mm = _ln(t1, None, None).astype(dtype)
    y = jax.lax.dot_general(mm, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b1.astype(jnp.float32)
    gg = _gelu(y, fast=dtype == jnp.bfloat16).astype(dtype)
    z = jax.lax.dot_general(gg, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return t1 + s2 * (z + b2.astype(jnp.float32))


def _s_train_fwd_kernel(x_ref, c_ref, dp_ref,
                        wqkv_ref, bqkv_ref, wp_ref, bp_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref,
                        wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                        xo_ref, co_ref, t1x_ref, t1c_ref, *,
                        scale, num_heads, head_dim, rows, n, m,
                        use_cpe, img_w, g):
    dtype = x_ref.dtype

    def branch(t, seq, mask_ref, s1, s2, out_ref, t1_ref):
        mask = mask_ref[:] if g > 1 else None
        a = _ln(t, None, None).astype(dtype)
        qkv = jax.lax.dot_general(a, wqkv_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dtype)
        c_dim = t.shape[-1]
        o_att = _attn_dir(qkv[:, :c_dim], qkv[:, c_dim:2 * c_dim],
                          qkv[:, 2 * c_dim:], rows, seq, seq, scale,
                          num_heads, head_dim, g, mask, dtype)
        o = jax.lax.dot_general(o_att, wp_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t1 = t.astype(jnp.float32) + s1 * (o + bp_ref[0].astype(
            jnp.float32))
        t1_ref[:] = t1.astype(dtype)
        out = _mlp_fwd(t1, s2, w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0],
                       dtype)
        out_ref[:] = out.astype(dtype)

    xflat = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    branch(xflat, n, maskx_ref, _dp_cols(dp_ref, 0, rows, n),
           _dp_cols(dp_ref, 1, rows, n), xo_ref, t1x_ref)
    branch(c_ref[:], m, maskc_ref, _dp_cols(dp_ref, 2, rows, m),
           _dp_cols(dp_ref, 3, rows, m), co_ref, t1c_ref)


def _dca_train_fwd_kernel(x_ref, c_ref, dp_ref,
                          wqkv1_ref, bqkv1_ref, wqkv2_ref, bqkv2_ref,
                          wpx_ref, bpx_ref, wpc_ref, bpc_ref,
                          w1_ref, b1_ref, w2_ref, b2_ref,
                          wcpe_ref, bcpe_ref, maskx_ref, maskc_ref,
                          xo_ref, co_ref, t1x_ref, t1c_ref, *,
                          scale_x, scale_c, num_heads, head_dim, rows,
                          n, m, use_cpe, img_w, gx, gc):
    dtype = x_ref.dtype
    c_dim = x_ref.shape[-1]
    xflat = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    cflat = c_ref[:]
    xa = _ln(xflat, None, None).astype(dtype)
    ca = _ln(cflat, None, None).astype(dtype)
    qkv1 = jax.lax.dot_general(xa, wqkv1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv1 = (qkv1 + bqkv1_ref[0].astype(jnp.float32)).astype(dtype)
    qkv2 = jax.lax.dot_general(ca, wqkv2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv2 = (qkv2 + bqkv2_ref[0].astype(jnp.float32)).astype(dtype)
    oatt_x = _attn_dir(qkv1[:, :c_dim], qkv2[:, c_dim:2 * c_dim],
                       qkv2[:, 2 * c_dim:], rows, n, m, scale_x,
                       num_heads, head_dim, gx,
                       maskx_ref[:] if gx > 1 else None, dtype)
    oatt_c = _attn_dir(qkv2[:, :c_dim], qkv1[:, c_dim:2 * c_dim],
                       qkv1[:, 2 * c_dim:], rows, m, n, scale_c,
                       num_heads, head_dim, gc,
                       maskc_ref[:] if gc > 1 else None, dtype)
    ox = jax.lax.dot_general(oatt_x, wpx_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    oc = jax.lax.dot_general(oatt_c, wpc_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t1x = xflat.astype(jnp.float32) + _dp_cols(dp_ref, 0, rows, n) * (
        ox + bpx_ref[0].astype(jnp.float32))
    t1c = cflat.astype(jnp.float32) + _dp_cols(dp_ref, 2, rows, m) * (
        oc + bpc_ref[0].astype(jnp.float32))
    t1x_ref[:] = t1x.astype(dtype)
    t1c_ref[:] = t1c.astype(dtype)
    xo_ref[:] = _mlp_fwd(t1x, _dp_cols(dp_ref, 1, rows, n), w1_ref[:],
                         b1_ref[0], w2_ref[:], b2_ref[0],
                         dtype).astype(dtype)
    co_ref[:] = _mlp_fwd(t1c, _dp_cols(dp_ref, 3, rows, m), w1_ref[:],
                         b1_ref[0], w2_ref[:], b2_ref[0],
                         dtype).astype(dtype)


# ---------------------------------------------------------------------------
# B1: shared MLP backward kernel (identical for S and D blocks)
# ---------------------------------------------------------------------------

def _mlp_bwd_kernel(t1_ref, dout_ref, dzv_ref, w1_ref, b1_ref, w2_ref,
                    dt1_ref, dw1_ref, db1_ref, dw2_ref):
    """Flat-token MLP backward tile: t1 + upstream grads -> dt1,
    recomputing LN/fc1/GELU in VMEM (one HBM pass over the (T, hidden)
    intermediates instead of XLA's materialized round trips). dzv (the
    droppath-scaled upstream grad) arrives precomputed from XLA. dW1,
    db1 and dW2 accumulate IN-KERNEL into fp32 resident output blocks
    (constant index map, init at grid step 0) — the previous design
    dumped the normed input and re-derived the (T, hidden) gelu/d-hidden
    pair in XLA, which materialized multi-GB intermediates at stage-1
    scale and made the XLA weight-grad pass 55% of the block backward.
    db2 = colsum(dzv) stays in XLA (dzv is an XLA-visible array)."""
    dtype = t1_ref.dtype
    fast = dtype == jnp.bfloat16
    t1 = t1_ref[:]
    dout = dout_ref[:].astype(jnp.float32)
    mm = _ln(t1, None, None).astype(dtype)
    y = jax.lax.dot_general(mm, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b1_ref[0].astype(jnp.float32)
    dz = dzv_ref[:]
    dgg = jax.lax.dot_general(dz, w2_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dy = (dgg * _gelu_grad(y, fast)).astype(dtype)
    dmm = jax.lax.dot_general(dy, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dt1_ref[:] = (dout + _ln_bwd(dmm, t1)).astype(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    gg = _gelu(y, fast=fast).astype(dtype)
    dw1_ref[...] += jax.lax.dot_general(
        mm, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[0:1, :] += jnp.sum(dy.astype(jnp.float32), axis=0,
                               keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        gg, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.jit
def _mlp_bwd_call(t1x, t1c, dxo, dco, dparr, w1, b1, w2):
    """Returns (dt1x, dt1c, dw1, db1, dw2, db2): the data grads plus the
    FULL MLP weight grads (fp32), accumulated in-kernel across both
    token streams. The dz streams are built here in XLA (per-image
    droppath scale * upstream grad, fused); db2 = their colsum."""
    bn, ch = t1x.shape
    bm = t1c.shape[0]
    b_imgs = dparr.shape[1]
    hidden = w1.shape[1]
    weights = [w1, _row(b1), w2]
    f32 = jnp.float32
    dt1s, dws, db2 = [], [], jnp.zeros((ch,), f32)
    acc_specs = [
        pl.BlockSpec((ch, hidden), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, hidden), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, ch), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc_shapes = [jax.ShapeDtypeStruct((ch, hidden), f32),
                  jax.ShapeDtypeStruct((8, hidden), f32),
                  jax.ShapeDtypeStruct((hidden, ch), f32)]
    for t1, dout, idx in ((t1x, dxo, 1), (t1c, dco, 3)):
        total = t1.shape[0]
        dzv = _xla_do(dout, dparr[idx], total // b_imgs, t1.dtype)
        db2 = db2 + jnp.sum(dzv.astype(f32), axis=0)
        bt = _pick_bt_mlp(total, ch, hidden)
        spec = pl.BlockSpec((bt, ch), lambda bi: (bi, 0),
                            memory_space=pltpu.VMEM)
        sd = jax.ShapeDtypeStruct((total, ch), t1.dtype)
        dt1, dw1, db1, dw2 = pl.pallas_call(
            _mlp_bwd_kernel,
            grid=(total // bt,),
            in_specs=[spec, spec, spec] + _wspec([w.shape for w in weights]),
            out_specs=[spec] + acc_specs,
            out_shape=[sd] + acc_shapes,
            interpret=_pb._INTERPRET,
            **_compiler_params(),
        )(t1, dout, dzv, *weights)
        dt1s.append(dt1)
        dws.append((dw1, db1[0], dw2))
    dw1 = dws[0][0] + dws[1][0]
    db1 = dws[0][1] + dws[1][1]
    dw2 = dws[0][2] + dws[1][2]
    return dt1s[0], dt1s[1], dw1, db1, dw2, db2


# ---------------------------------------------------------------------------
# B2: attention backward kernels
# ---------------------------------------------------------------------------

def _attn_dir_bwd_dump(doatt, q, k, v, rows, sq, sk, scale, num_heads,
                       head_dim, g, mask, dtype, dq_ref, dkv_ref,
                       oatt_ref):
    """Backward of _attn_dir, writing per-(row, group) results STRAIGHT
    into output-ref slices (no concat temporaries — the liveness-peak
    trim that fits base stage3 under the 16 MB scoped-VMEM limit). The
    recomputed o is dumped alongside. Both grad refs are (S, 3*C)
    q|k|v-third layouts: dq lands in dq_ref's q third, dk/dv in
    dkv_ref's k/v thirds (the same ref for S blocks; the OPPOSITE
    stream's for DCA, whose keys/values come from the other stream)."""
    c_dim = num_heads * head_dim
    for r in range(rows):
        qs = slice(r * sq, (r + 1) * sq)
        ks = slice(r * sk, (r + 1) * sk)
        for h0 in range(0, num_heads, g):
            lo, hi = h0 * head_dim, (h0 + g) * head_dim
            gs = slice(lo, hi)
            o, dqg, dkg, dvg = _attn_grp_bwd(
                doatt[qs, gs], q[qs, gs], k[ks, gs], v[ks, gs],
                scale, head_dim, mask)
            oatt_ref[qs, gs] = o.astype(dtype)
            dq_ref[qs, lo:hi] = dqg.astype(dtype)
            dkv_ref[ks, c_dim + lo:c_dim + hi] = dkg.astype(dtype)
            dkv_ref[ks, 2 * c_dim + lo:2 * c_dim + hi] = dvg.astype(dtype)


def _s_attn_bwd_kernel(x_ref, c_ref, dp_ref,
                       wqkv_ref, bqkv_ref, wp_ref,
                       wcpe_ref, bcpe_ref, wcpef_ref,
                       maskx_ref, maskc_ref,
                       dt1x_ref, dt1c_ref,
                       dx_ref, dc_ref,
                       dwqkv_ref, dbqkv_ref, dwp_ref, dwcpe_ref,
                       dqkvx_ref, oattx_ref,
                       dqkvc_ref, oattc_ref, *,
                       scale, num_heads, head_dim, rows, n, m,
                       use_cpe, img_w, g):
    """Lean S-block attention backward. Outputs: dx/dc are the data
    grads PRE-CPE-transpose (the caller applies the flipped-tap window
    product in XLA — one fused elementwise pass — so this kernel carries
    one less (N, C) output stream); dWqkv/dbqkv/dWp accumulate IN-KERNEL
    into fp32 resident blocks (the dqkv/oatt streams live only in VMEM
    scratch now — no HBM dumps, no XLA einsum pass). dbp stays in XLA:
    do derives from dt1, which the caller already holds."""
    dtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dwcpe_ref[...] = jnp.zeros_like(dwcpe_ref)

    def branch(t, seq, mask_ref, s1, dt1_ref, dqkv_ref, oatt_ref):
        mask = mask_ref[:] if g > 1 else None
        a = _ln(t, None, None).astype(dtype)
        qkv = jax.lax.dot_general(a, wqkv_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dtype)
        c_dim = t.shape[-1]
        q = qkv[:, :c_dim]
        k = qkv[:, c_dim:2 * c_dim]
        v = qkv[:, 2 * c_dim:]
        dt1 = dt1_ref[:].astype(jnp.float32)
        do = (s1 * dt1).astype(dtype)
        doatt = jax.lax.dot_general(do, wp_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        _attn_dir_bwd_dump(doatt, q, k, v, rows, seq, seq, scale,
                           num_heads, head_dim, g, mask, dtype,
                           dqkv_ref, dqkv_ref, oatt_ref)
        dqkv = dqkv_ref[:]
        dwqkv_ref[...] += jax.lax.dot_general(
            a, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[0:1, :] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                     keepdims=True)
        dwp_ref[...] += jax.lax.dot_general(
            oatt_ref[:], do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(dqkv, wqkv_ref[:],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dt1 + _ln_bwd(da, t)

    xraw = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xraw, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    else:
        xflat = xraw
    dtx = branch(xflat, n, maskx_ref, _dp_cols(dp_ref, 0, rows, n),
                 dt1x_ref, dqkvx_ref, oattx_ref)
    if use_cpe:
        # ROADMAP lever #1: CPE tap grads accumulate in-kernel and the
        # flipped-tap transpose applies here — no XLA conv pair, no f32
        # re-reads of x / the pre-transpose grad
        dwcpe_ref[...] += _cpe_tap_grads_flat(xraw, dtx,
                                              n // img_w, img_w)
        dtx = _cpe_flat(dtx, wcpef_ref[:],
                        jnp.zeros((1, dtx.shape[1]), dtx.dtype),
                        n // img_w, img_w)
    dx_ref[:] = dtx.astype(dtype)
    dtc = branch(c_ref[:], m, maskc_ref, _dp_cols(dp_ref, 2, rows, m),
                 dt1c_ref, dqkvc_ref, oattc_ref)
    dc_ref[:] = dtc.astype(dtype)


def _dca_attn_bwd_kernel(x_ref, c_ref, dp_ref,
                         wqkv1_ref, bqkv1_ref, wqkv2_ref, bqkv2_ref,
                         wpx_ref, wpc_ref,
                         wcpe_ref, bcpe_ref, wcpef_ref,
                         maskx_ref, maskc_ref,
                         dt1x_ref, dt1c_ref,
                         dx_ref, dc_ref,
                         dwqkv1_ref, dbqkv1_ref, dwqkv2_ref, dbqkv2_ref,
                         dwpx_ref, dwpc_ref, dwcpe_ref,
                         dqkv1_ref, oattx_ref,
                         dqkv2_ref, oattc_ref, *,
                         scale_x, scale_c, num_heads, head_dim, rows,
                         n, m, use_cpe, img_w, gx, gc):
    """Lean DCA backward (see _s_attn_bwd_kernel): dx is the data grad
    PRE-CPE-transpose; do/dqkv-concat/oatt temporaries eliminated via
    direct slice writes. dq1 lands in dqkv1's q third while dk2/dv2 land
    in dqkv2's k/v thirds (cross-stream keys), and vice versa. All
    projection weight grads accumulate IN-KERNEL (fp32 resident blocks);
    dqkv/oatt live in VMEM scratch only — no HBM dumps."""
    dtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv1_ref[...] = jnp.zeros_like(dwqkv1_ref)
        dbqkv1_ref[...] = jnp.zeros_like(dbqkv1_ref)
        dwqkv2_ref[...] = jnp.zeros_like(dwqkv2_ref)
        dbqkv2_ref[...] = jnp.zeros_like(dbqkv2_ref)
        dwpx_ref[...] = jnp.zeros_like(dwpx_ref)
        dwpc_ref[...] = jnp.zeros_like(dwpc_ref)
        dwcpe_ref[...] = jnp.zeros_like(dwcpe_ref)
    c_dim = x_ref.shape[-1]
    maskx = maskx_ref[:] if gx > 1 else None
    maskc = maskc_ref[:] if gc > 1 else None
    xraw = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xraw, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    else:
        xflat = xraw
    cflat = c_ref[:]
    xa = _ln(xflat, None, None).astype(dtype)
    ca = _ln(cflat, None, None).astype(dtype)
    qkv1 = jax.lax.dot_general(xa, wqkv1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv1 = (qkv1 + bqkv1_ref[0].astype(jnp.float32)).astype(dtype)
    qkv2 = jax.lax.dot_general(ca, wqkv2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv2 = (qkv2 + bqkv2_ref[0].astype(jnp.float32)).astype(dtype)
    q1, k1, v1 = (qkv1[:, :c_dim], qkv1[:, c_dim:2 * c_dim],
                  qkv1[:, 2 * c_dim:])
    q2, k2, v2 = (qkv2[:, :c_dim], qkv2[:, c_dim:2 * c_dim],
                  qkv2[:, 2 * c_dim:])
    dt1x = dt1x_ref[:].astype(jnp.float32)
    dt1c = dt1c_ref[:].astype(jnp.float32)
    dox = (_dp_cols(dp_ref, 0, rows, n) * dt1x).astype(dtype)
    doc = (_dp_cols(dp_ref, 2, rows, m) * dt1c).astype(dtype)
    doattx = jax.lax.dot_general(dox, wpx_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    doattc = jax.lax.dot_general(doc, wpc_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    _attn_dir_bwd_dump(doattx, q1, k2, v2, rows, n, m, scale_x,
                       num_heads, head_dim, gx, maskx, dtype,
                       dqkv1_ref, dqkv2_ref, oattx_ref)
    _attn_dir_bwd_dump(doattc, q2, k1, v1, rows, m, n, scale_c,
                       num_heads, head_dim, gc, maskc, dtype,
                       dqkv2_ref, dqkv1_ref, oattc_ref)
    f32 = jnp.float32
    dqkv1 = dqkv1_ref[:]
    dqkv2 = dqkv2_ref[:]
    dwqkv1_ref[...] += jax.lax.dot_general(
        xa, dqkv1, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbqkv1_ref[0:1, :] += jnp.sum(dqkv1.astype(f32), axis=0,
                                  keepdims=True)
    dwqkv2_ref[...] += jax.lax.dot_general(
        ca, dqkv2, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbqkv2_ref[0:1, :] += jnp.sum(dqkv2.astype(f32), axis=0,
                                  keepdims=True)
    dwpx_ref[...] += jax.lax.dot_general(
        oattx_ref[:], dox, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dwpc_ref[...] += jax.lax.dot_general(
        oattc_ref[:], doc, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    da_x = jax.lax.dot_general(dqkv1, wqkv1_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    da_c = jax.lax.dot_general(dqkv2, wqkv2_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dtx = dt1x + _ln_bwd(da_x, xflat)
    if use_cpe:
        # in-kernel CPE tap grads + flipped-tap transpose (see
        # _s_attn_bwd_kernel)
        dwcpe_ref[...] += _cpe_tap_grads_flat(xraw, dtx,
                                              n // img_w, img_w)
        dtx = _cpe_flat(dtx, wcpef_ref[:],
                        jnp.zeros((1, dtx.shape[1]), dtx.dtype),
                        n // img_w, img_w)
    dx_ref[:] = dtx.astype(dtype)
    dc_ref[:] = (dt1c + _ln_bwd(da_c, cflat)).astype(dtype)


# ---------------------------------------------------------------------------
# Host-side orchestration (jitted wrappers + custom_vjp)
# ---------------------------------------------------------------------------

def _fwd_specs(b, n, m, ch, rows, weights):
    x_spec = pl.BlockSpec((rows * n, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((rows * m, ch), lambda bi: (bi, 0),
                          memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    w_specs = _wspec([w.shape for w in weights])
    return x_spec, c_spec, dp_spec, w_specs


def _cpe_arrays(cpe, ch, dtype):
    if cpe is not None:
        return cpe[0], _row(cpe[1])
    return jnp.zeros((9, ch), dtype), jnp.zeros((1, ch), dtype)


def _xla_cpe(x, cpe, b, n, ch, img_w):
    """XLA twin of the in-kernel fused CPE (pad + 9 window products)."""
    if cpe is None:
        return x
    taps, bias = cpe
    h = n // (img_w or 1)
    xv = x.reshape(b, h, img_w, ch)
    xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(xv) + bias.astype(x.dtype)
    for ky in range(3):
        for kx in range(3):
            win = jax.lax.dynamic_slice(xp, (0, ky, kx, 0),
                                        (b, h, img_w, ch))
            acc = acc + win * taps[ky * 3 + kx].astype(x.dtype)
    return (xv + acc).reshape(b, n, ch)


def _xla_do(dt1, scales, seq, dtype):
    """do = per-image droppath scale * dt1 as a flat (B*seq, C) bf16 —
    the XLA twin of the scaling the kernel applies before the projection
    backward (fuses into the downstream weight-grad einsums)."""
    b = scales.shape[0]
    d3 = dt1.reshape(b, seq, -1).astype(jnp.float32)
    return (scales[:, None, None] * d3).astype(dtype).reshape(dt1.shape)


def _xla_cpe_t(dtu, cpe, b, n, ch, img_w):
    """Transpose of the fused 3x3 CPE: dx = dtu + flipped-tap window
    product (zero bias). One fused elementwise XLA pass, traded for an
    (N, C) output stream the backward kernel no longer carries."""
    taps, _ = cpe
    zero = jnp.zeros_like(taps[0])
    return _xla_cpe(dtu.reshape(b, n, ch), (taps[::-1], zero),
                    b, n, ch, img_w).reshape(dtu.shape)


def _xla_norm(t, dtype):
    t32 = t.astype(jnp.float32)
    mu = jnp.mean(t32, -1, keepdims=True)
    var = jnp.mean(jnp.square(t32 - mu), -1, keepdims=True)
    return ((t32 - mu) * jax.lax.rsqrt(var + _EPS)).astype(dtype)


def _cpe_grads(x, dtu, b, n, ch, img_w, wcpe_dtype, bcpe_dtype):
    """Tap/bias grads of the fused 3x3 CPE on the dumped pre-transpose
    grad dtu, as ONE conv-backward-filter op: dW[ky,kx,c] =
    sum_bhw x_pad[b, h+ky, w+kx, c] * dtu[b, h, w, c]. The previous form
    (9 dynamic-slice window products, each its own fp32 product+reduce
    pass) cost ~18 full activation reads per block — at stage-1 scale
    (256x3136x96) that alone was ~6 ms/block of HBM traffic."""
    h = n // (img_w or 1)
    # f32 operands: the conv-backward-filter rule requires primal input
    # and cotangent dtypes to match (bf16 x alone TypeErrors), and f32
    # products match the precision of the slice-reduce form this replaced
    xv = x.reshape(b, h, img_w, ch).astype(jnp.float32)
    dv = dtu.reshape(b, h, img_w, ch).astype(jnp.float32)

    def dwconv(taps):
        k = taps.reshape(3, 3, 1, ch)
        return jax.lax.conv_general_dilated(
            xv, k, (1, 1), "SAME", feature_group_count=ch,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(dwconv, jnp.zeros((9, ch), jnp.float32))
    (dtaps,) = vjp(dv)
    return (dtaps.astype(wcpe_dtype),
            jnp.sum(dv, axis=(0, 1, 2)).astype(bcpe_dtype))


# ----- S block -----

@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                              "img_w", "use_cpe"))
def _s_train_fwd_call(x, c, params, cpe, dp, scale, num_heads, img_w,
                      use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wqkv, bqkv, wp, bp, w1, b1, w2, b2) = params
    hidden = w1.shape[1]
    rows = _pick_rows_train(b, n, ch, hidden, m)
    g = _pick_group(num_heads, d)
    dummy = jnp.zeros((8, 128), x.dtype)
    maskx = _bd_mask(n, g, d, x.dtype) if g > 1 else dummy
    maskc = _bd_mask(m, g, d, x.dtype) if g > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    weights = [wqkv, _row(bqkv), wp, _row(bp), w1, _row(b1), w2, _row(b2),
               wcpe, bcpe, maskx, maskc]
    kernel = functools.partial(
        _s_train_fwd_kernel, scale=float(scale), num_heads=num_heads,
        head_dim=d, rows=rows, n=n, m=m, use_cpe=use_cpe,
        img_w=img_w or 1, g=g)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    xo, co, t1x, t1c = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs,
        out_specs=[x_spec, c_spec, x_spec, c_spec],
        out_shape=[sd(b * n, ch), sd(b * m, ch), sd(b * n, ch),
                   sd(b * m, ch)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights)
    return (xo.reshape(x.shape), co.reshape(c.shape), t1x, t1c)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                              "img_w", "use_cpe"))
def _s_train_bwd_call(x, c, params, cpe, dp, t1x, t1c, dxo, dco, scale,
                      num_heads, img_w, use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wqkv, bqkv, wp, bp, w1, b1, w2, b2) = params
    hidden = w1.shape[1]
    rows = _pick_rows_bwd_attn(b, n, ch, m, num_heads)
    g = _pick_group(num_heads, d)
    dummy = jnp.zeros((8, 128), x.dtype)
    maskx = _bd_mask(n, g, d, x.dtype) if g > 1 else dummy
    maskc = _bd_mask(m, g, d, x.dtype) if g > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    dxo2 = dxo.reshape(b * n, ch)
    dco2 = dco.reshape(b * m, ch)

    # B1: MLP backward (shared kernel, in-kernel weight grads)
    dt1x, dt1c, dw1, db1, dw2, db2 = _mlp_bwd_call(
        t1x, t1c, dxo2, dco2, dparr, w1, b1, w2)

    # B2: attention backward (in-kernel dWqkv/dbqkv/dWp accumulation;
    # dqkv/oatt streams live in VMEM scratch only)
    weights = [wqkv, _row(bqkv), wp, wcpe, bcpe, wcpe[::-1],
               maskx, maskc]
    kernel = functools.partial(
        _s_attn_bwd_kernel, scale=float(scale), num_heads=num_heads,
        head_dim=d, rows=rows, n=n, m=m, use_cpe=use_cpe,
        img_w=img_w or 1, g=g)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    f32 = jnp.float32
    acc_specs = [
        pl.BlockSpec((ch, 3 * ch), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 3 * ch), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, ch), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, ch), lambda bi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc_shapes = [jax.ShapeDtypeStruct((ch, 3 * ch), f32),
                  jax.ShapeDtypeStruct((8, 3 * ch), f32),
                  jax.ShapeDtypeStruct((ch, ch), f32),
                  jax.ShapeDtypeStruct((16, ch), f32)]
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs + [x_spec, c_spec],
        out_specs=[x_spec, c_spec] + acc_specs,
        out_shape=[sd(b * n, ch), sd(b * m, ch)] + acc_shapes,
        scratch_shapes=[pltpu.VMEM((rows * n, 3 * ch), x.dtype),
                        pltpu.VMEM((rows * n, ch), x.dtype),
                        pltpu.VMEM((rows * m, 3 * ch), x.dtype),
                        pltpu.VMEM((rows * m, ch), x.dtype)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights, dt1x, dt1c)
    (dtu, dc2, dwqkv, dbqkv, dwp, dwcpe) = outs
    dbqkv = dbqkv[0]

    colsum = lambda t: jnp.sum(t.astype(f32), axis=0)
    # dbp (= colsum of droppath-scale * dt1) stays in XLA — one fused
    # elementwise+reduce pass over streams the caller already holds
    dbp = (colsum(_xla_do(dt1x, dparr[0], n, x.dtype))
           + colsum(_xla_do(dt1c, dparr[2], m, x.dtype)))
    dparams = (dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
               dwp.astype(wp.dtype), dbp.astype(bp.dtype),
               dw1.astype(w1.dtype), db1.astype(b1.dtype),
               dw2.astype(w2.dtype), db2.astype(b2.dtype))
    # CPE transpose + tap grads are IN-KERNEL (dtu arrives post-transpose;
    # dwcpe rows 0-8 = taps, row 9 = bias)
    dcpe = ((dwcpe[:9].astype(wcpe.dtype), dwcpe[9].astype(bcpe.dtype))
            if use_cpe else None)
    return (dtu.reshape(x.shape), dc2.reshape(c.shape), dparams, dcpe)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _s_train(x, c, params, cpe, dp, scale, num_heads, img_w):
    out = _s_train_fwd_call(x, c, params, cpe, dp, scale, num_heads,
                            img_w, cpe is not None)
    return out[0], out[1]


def _s_train_fwd_rule(x, c, params, cpe, dp, scale, num_heads, img_w):
    xo, co, t1x, t1c = _s_train_fwd_call(
        x, c, params, cpe, dp, scale, num_heads, img_w, cpe is not None)
    return (xo, co), (x, c, params, cpe, dp, t1x, t1c)


def _s_train_bwd_rule(scale, num_heads, img_w, res, grads):
    x, c, params, cpe, dp, t1x, t1c = res
    dxo, dco = grads
    dx, dc, dparams, dcpe = _s_train_bwd_call(
        x, c, params, cpe, dp, t1x, t1c, dxo.astype(x.dtype),
        dco.astype(c.dtype), scale, num_heads, img_w, cpe is not None)
    ddp = tuple(jnp.zeros_like(s) for s in dp)
    return (dx, dc, dparams, dcpe, ddp)


_s_train.defvjp(_s_train_fwd_rule, _s_train_bwd_rule)


def s_block_train(x, c, params, dp, *, num_heads: int, cpe=None,
                  img_w: int = 0):
    """Fused S-type LeMeBlock TRAINING step (differentiable).

    x (B,N,C), c (B,M,C); params = LN-folded 8-tuple
    (Wqkv', bqkv', Wp, bp, W1', b1', W2, b2) — fold with
    pallas_block._fold_ln OUTSIDE this call so LN affine grads chain
    automatically. dp = (s1x, s2x, s1c, s2c) per-sample fp32 branch
    scales (keep_mask / keep_prob, or ones when drop_path == 0).
    cpe = ((9,C) taps, (C,) bias) fuses the 3x3 position embedding
    (pass PRE-CPE x); taps/bias receive exact grads.

    Returns (x_out, c_out) or None when the shape doesn't qualify."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    d = ch // num_heads
    m = c.shape[1]
    if n > _MAX_N_SBLOCK or ch % num_heads != 0 or m % 8 != 0:
        return None
    hidden = params[4].shape[1]
    if (_pick_rows_train(b, n, ch, hidden, m) == 0
            or _pick_rows_bwd_mlp(b, n, ch, hidden, m) == 0
            or _pick_rows_bwd_attn(b, n, ch, m, num_heads) == 0):
        return None
    scale = d ** -0.5
    return tuple(_s_train(x, c, tuple(params),
                          tuple(cpe) if cpe is not None else None,
                          tuple(dp), scale, num_heads, img_w))


# ----- D block -----

@functools.partial(jax.jit, static_argnames=("scale_x", "scale_c",
                                              "num_heads", "img_w",
                                              "use_cpe"))
def _dca_train_fwd_call(x, c, params, cpe, dp, scale_x, scale_c,
                        num_heads, img_w, use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     w1, b1, w2, b2) = params
    hidden = w1.shape[1]
    rows = _pick_rows_train(b, n, ch, hidden, m)
    g = _pick_group(num_heads, d)
    gx = g
    gc = g if g * n <= _pb._MAX_BD_ROWS else 1
    dummy = jnp.zeros((8, 128), x.dtype)
    maskx = _bd_mask(m, gx, d, x.dtype) if gx > 1 else dummy
    maskc = _bd_mask(n, gc, d, x.dtype) if gc > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    weights = [wqkv1, _row(bqkv1), wqkv2, _row(bqkv2), wpx, _row(bpx),
               wpc, _row(bpc), w1, _row(b1), w2, _row(b2),
               wcpe, bcpe, maskx, maskc]
    kernel = functools.partial(
        _dca_train_fwd_kernel, scale_x=float(scale_x),
        scale_c=float(scale_c), num_heads=num_heads, head_dim=d,
        rows=rows, n=n, m=m, use_cpe=use_cpe, img_w=img_w or 1,
        gx=gx, gc=gc)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    xo, co, t1x, t1c = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs,
        out_specs=[x_spec, c_spec, x_spec, c_spec],
        out_shape=[sd(b * n, ch), sd(b * m, ch), sd(b * n, ch),
                   sd(b * m, ch)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights)
    return (xo.reshape(x.shape), co.reshape(c.shape), t1x, t1c)


@functools.partial(jax.jit, static_argnames=("scale_x", "scale_c",
                                              "num_heads", "img_w",
                                              "use_cpe"))
def _dca_train_bwd_call(x, c, params, cpe, dp, t1x, t1c, dxo, dco,
                        scale_x, scale_c, num_heads, img_w, use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     w1, b1, w2, b2) = params
    hidden = w1.shape[1]
    rows = _pick_rows_bwd_attn(b, n, ch, m, num_heads, dca=True)
    g = _pick_group(num_heads, d)
    gx = g
    gc = g if g * n <= _BWD_BD_ROWS else 1
    dummy = jnp.zeros((8, 128), x.dtype)
    maskx = _bd_mask(m, gx, d, x.dtype) if gx > 1 else dummy
    maskc = _bd_mask(n, gc, d, x.dtype) if gc > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    dxo2 = dxo.reshape(b * n, ch)
    dco2 = dco.reshape(b * m, ch)

    dt1x, dt1c, dw1, db1, dw2, db2 = _mlp_bwd_call(
        t1x, t1c, dxo2, dco2, dparr, w1, b1, w2)

    weights = [wqkv1, _row(bqkv1), wqkv2, _row(bqkv2), wpx, wpc,
               wcpe, bcpe, wcpe[::-1], maskx, maskc]
    kernel = functools.partial(
        _dca_attn_bwd_kernel, scale_x=float(scale_x),
        scale_c=float(scale_c), num_heads=num_heads, head_dim=d,
        rows=rows, n=n, m=m, use_cpe=use_cpe, img_w=img_w or 1,
        gx=gx, gc=gc)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    f32 = jnp.float32
    acc_spec = lambda r_, c_: pl.BlockSpec(
        (r_, c_), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    acc_specs = [acc_spec(ch, 3 * ch), acc_spec(8, 3 * ch),
                 acc_spec(ch, 3 * ch), acc_spec(8, 3 * ch),
                 acc_spec(ch, ch), acc_spec(ch, ch), acc_spec(16, ch)]
    fsd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), f32)
    acc_shapes = [fsd(ch, 3 * ch), fsd(8, 3 * ch),
                  fsd(ch, 3 * ch), fsd(8, 3 * ch),
                  fsd(ch, ch), fsd(ch, ch), fsd(16, ch)]
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs + [x_spec, c_spec],
        out_specs=[x_spec, c_spec] + acc_specs,
        out_shape=[sd(b * n, ch), sd(b * m, ch)] + acc_shapes,
        scratch_shapes=[pltpu.VMEM((rows * n, 3 * ch), x.dtype),
                        pltpu.VMEM((rows * n, ch), x.dtype),
                        pltpu.VMEM((rows * m, 3 * ch), x.dtype),
                        pltpu.VMEM((rows * m, ch), x.dtype)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights, dt1x, dt1c)
    (dtu, dc2, dwqkv1, dbqkv1, dwqkv2, dbqkv2, dwpx, dwpc,
     dwcpe) = outs

    colsum = lambda t: jnp.sum(t.astype(f32), axis=0)
    dbpx = colsum(_xla_do(dt1x, dparr[0], n, x.dtype))
    dbpc = colsum(_xla_do(dt1c, dparr[2], m, x.dtype))
    dparams = (dwqkv1.astype(wqkv1.dtype),
               dbqkv1[0].astype(bqkv1.dtype),
               dwqkv2.astype(wqkv2.dtype),
               dbqkv2[0].astype(bqkv2.dtype),
               dwpx.astype(wpx.dtype),
               dbpx.astype(bpx.dtype),
               dwpc.astype(wpc.dtype),
               dbpc.astype(bpc.dtype),
               dw1.astype(w1.dtype), db1.astype(b1.dtype),
               dw2.astype(w2.dtype), db2.astype(b2.dtype))
    dcpe = ((dwcpe[:9].astype(wcpe.dtype), dwcpe[9].astype(bcpe.dtype))
            if use_cpe else None)
    return dtu.reshape(x.shape), dc2.reshape(c.shape), dparams, dcpe


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _dca_train(x, c, params, cpe, dp, scale_x, scale_c, num_heads, img_w):
    out = _dca_train_fwd_call(x, c, params, cpe, dp, scale_x, scale_c,
                              num_heads, img_w, cpe is not None)
    return out[0], out[1]


def _dca_train_fwd_rule(x, c, params, cpe, dp, scale_x, scale_c,
                        num_heads, img_w):
    xo, co, t1x, t1c = _dca_train_fwd_call(
        x, c, params, cpe, dp, scale_x, scale_c, num_heads, img_w,
        cpe is not None)
    return (xo, co), (x, c, params, cpe, dp, t1x, t1c)


def _dca_train_bwd_rule(scale_x, scale_c, num_heads, img_w, res, grads):
    x, c, params, cpe, dp, t1x, t1c = res
    dxo, dco = grads
    dx, dc, dparams, dcpe = _dca_train_bwd_call(
        x, c, params, cpe, dp, t1x, t1c, dxo.astype(x.dtype),
        dco.astype(c.dtype), scale_x, scale_c, num_heads, img_w,
        cpe is not None)
    ddp = tuple(jnp.zeros_like(s) for s in dp)
    return (dx, dc, dparams, dcpe, ddp)


_dca_train.defvjp(_dca_train_fwd_rule, _dca_train_bwd_rule)


def dca_block_train(x, c, params, dp, *, num_heads: int, scale_x: float,
                    scale_c: float, cpe=None, img_w: int = 0):
    """Fused D-type LeMeBlock TRAINING step (differentiable). params =
    LN-folded 12-tuple (Wqkv1', bqkv1', Wqkv2', bqkv2', Wpx, bpx, Wpc,
    bpc, W1', b1', W2, b2); dp/cpe as in s_block_train.

    Declines (returns None) when the whole image doesn't fit one tile
    (stage-1-scale blocks fall back to the XLA composition)."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    m = c.shape[1]
    if ch % num_heads != 0 or m % 8 != 0 or n > 4096:
        return None
    hidden = params[8].shape[1]
    if (_pick_rows_train(b, n, ch, hidden, m) == 0
            or _pick_rows_bwd_mlp(b, n, ch, hidden, m) == 0
            or _pick_rows_bwd_attn(b, n, ch, m, num_heads, dca=True) == 0):
        return None
    return tuple(_dca_train(x, c, tuple(params),
                            tuple(cpe) if cpe is not None else None,
                            tuple(dp), float(scale_x), float(scale_c),
                            num_heads, img_w))


# ----- C block -----
#
# The meta-token initializer (ref models/lemevit.py:425-497 + :584-613):
# q from the meta tokens, k/v from the (CPE-shifted) image tokens, only c
# is updated — x passes through UNCHANGED but receives gradients through
# the k/v projection (and the CPE taps). The MLP rides only the m=16
# meta rows, so its backward runs in plain XLA (a few hundred KB); the
# kernels carry the N-side work: k/v projection + thin-query attention
# forward, and the recompute + dkv/dq/dxt backward.


def _c_group(num_heads, head_dim, n):
    """Head grouping for the thin-query direction: the block-diagonal
    key expansion costs (g*n, g*d) — per-head loop beyond the Mosaic
    row bound (same rule as the DCA backward's gc)."""
    g = _pick_group(num_heads, head_dim)
    return g if g * n <= _BWD_BD_ROWS else 1


def _pick_rows_c_fwd(b, n, ch, m):
    """C-block forward fold: x + kv transient + small c-side buffers."""
    cp = _lanes(ch)
    per_row = 2 * (2 * n * cp                 # x in (double-buffered)
                   + n * _lanes(2 * ch)       # kv transient
                   + n * cp)                  # xa / f32 peaks (approx)
    budget = int(os.environ.get("PB_TRAIN_VMEM_MB", "8")) * 1024 * 1024
    for r in _aligned_folds(b, n, m):
        if per_row * r < budget:
            return r
    return 0


def _pick_rows_c_bwd(b, n, ch, m, num_heads):
    """C-block backward fold via an explicit lane-padded byte model."""
    budget = _bwd_budget()
    cp, cp2 = _lanes(ch), _lanes(2 * ch)
    g = _c_group(num_heads, ch // num_heads, n)
    w = 2 * (ch * ch + 2 * ch * ch + ch * ch)     # wq + wkv + wp
    acc = 4 * (ch * cp2 + 8 * cp2)                # resident fp32 dWkv
    for r in _aligned_folds(b, n, m):
        io = 2 * 2 * (r * n * (cp + cp)           # x in, dxt out
                      + r * m * 4 * cp)           # c, dt1c, dc, dq, oatt
        scratch = 2 * r * n * cp2                 # dkv, single-buffered
        kv = 2 * r * n * cp2                      # kv recompute (bf16)
        f32 = 4 * r * n * (cp2 + cp)              # dxa + ln-bwd peak
        scores = 12 * r * m * _lanes(g * n)       # p/dp fp32, thin query
        if w + acc + io + scratch + kv + f32 + scores <= budget:
            return r
    return 0


def _c_train_fwd_kernel(x_ref, c_ref, dp_ref,
                        wq_ref, bq_ref, wkv_ref, bkv_ref,
                        wp_ref, bp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        wcpe_ref, bcpe_ref, maskc_ref,
                        co_ref, t1c_ref, *,
                        scale, num_heads, head_dim, rows, n, m,
                        use_cpe, img_w, g):
    dtype = x_ref.dtype
    xflat = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xflat, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    xa = _ln(xflat, None, None).astype(dtype)
    kv = jax.lax.dot_general(xa, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[0].astype(jnp.float32)).astype(dtype)
    ca = _ln(c_ref[:], None, None).astype(dtype)
    q = jax.lax.dot_general(ca, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    q = (q + bq_ref[0].astype(jnp.float32)).astype(dtype)
    c_dim = xflat.shape[-1]
    oatt = _attn_dir(q, kv[:, :c_dim], kv[:, c_dim:], rows, m, n, scale,
                     num_heads, head_dim, g,
                     maskc_ref[:] if g > 1 else None, dtype)
    o = jax.lax.dot_general(oatt, wp_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t1c = c_ref[:].astype(jnp.float32) + _dp_cols(dp_ref, 2, rows, m) * (
        o + bp_ref[0].astype(jnp.float32))
    t1c_ref[:] = t1c.astype(dtype)
    co_ref[:] = _mlp_fwd(t1c, _dp_cols(dp_ref, 3, rows, m), w1_ref[:],
                         b1_ref[0], w2_ref[:], b2_ref[0],
                         dtype).astype(dtype)


def _c_attn_bwd_kernel(x_ref, c_ref, dp_ref,
                       wq_ref, bq_ref, wkv_ref, bkv_ref, wp_ref,
                       wcpe_ref, bcpe_ref, wcpef_ref, maskc_ref,
                       dt1c_ref,
                       dxt_ref, dc_ref, dq_ref, oatt_ref,
                       dwkv_ref, dbkv_ref, dwcpe_ref,
                       dkv_ref, *,
                       scale, num_heads, head_dim, rows, n, m,
                       use_cpe, img_w, g):
    """C-block attention backward: recompute q/k/v, run the thin-query
    attention backward per (row, head-group), and emit the data grads
    (dxt PRE-CPE-transpose, dc) plus the thin dq/oatt streams for the
    XLA weight-grad einsums (both ride the tiny c stream). The WIDE
    dkv stream lives in VMEM scratch only: dWkv/dbkv accumulate
    IN-KERNEL (fp32 resident blocks) against the recomputed xa, so the
    (T, 2C) dump and the XLA norm(x) recompute both disappear."""
    dtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwkv_ref[...] = jnp.zeros_like(dwkv_ref)
        dbkv_ref[...] = jnp.zeros_like(dbkv_ref)
        dwcpe_ref[...] = jnp.zeros_like(dwcpe_ref)
    xraw = x_ref[:]
    if use_cpe:
        xflat = _cpe_flat(xraw, wcpe_ref[:], bcpe_ref[0],
                          n // img_w, img_w)
    else:
        xflat = xraw
    xa = _ln(xflat, None, None).astype(dtype)
    kv = jax.lax.dot_general(xa, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[0].astype(jnp.float32)).astype(dtype)
    cflat = c_ref[:]
    ca = _ln(cflat, None, None).astype(dtype)
    q = jax.lax.dot_general(ca, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    q = (q + bq_ref[0].astype(jnp.float32)).astype(dtype)
    c_dim = xflat.shape[-1]
    k = kv[:, :c_dim]
    v = kv[:, c_dim:]
    dt1 = dt1c_ref[:].astype(jnp.float32)
    do = (_dp_cols(dp_ref, 2, rows, m) * dt1).astype(dtype)
    doatt = jax.lax.dot_general(do, wp_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mask = maskc_ref[:] if g > 1 else None
    for r in range(rows):
        qs = slice(r * m, (r + 1) * m)
        ks = slice(r * n, (r + 1) * n)
        for h0 in range(0, num_heads, g):
            lo, hi = h0 * head_dim, (h0 + g) * head_dim
            gs = slice(lo, hi)
            o, dqg, dkg, dvg = _attn_grp_bwd(
                doatt[qs, gs], q[qs, gs], k[ks, gs], v[ks, gs],
                scale, head_dim, mask)
            oatt_ref[qs, gs] = o.astype(dtype)
            dq_ref[qs, gs] = dqg.astype(dtype)
            dkv_ref[ks, lo:hi] = dkg.astype(dtype)
            dkv_ref[ks, c_dim + lo:c_dim + hi] = dvg.astype(dtype)
    # dc: residual + q-projection path through the (folded) LN
    dca = jax.lax.dot_general(dq_ref[:], wq_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dc_ref[:] = (dt1 + _ln_bwd(dca, cflat)).astype(dtype)
    # dWkv/dbkv: in-kernel accumulation against the recomputed xa
    dkv = dkv_ref[:]
    dwkv_ref[...] += jax.lax.dot_general(
        xa, dkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbkv_ref[0:1, :] += jnp.sum(dkv.astype(jnp.float32), axis=0,
                                keepdims=True)
    # dxt: k/v-projection path (x has no residual through this block)
    dxa = jax.lax.dot_general(dkv, wkv_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dxt = _ln_bwd(dxa, xflat)
    if use_cpe:
        # in-kernel CPE tap grads + flipped-tap transpose (see
        # _s_attn_bwd_kernel); the pass-through residual grad is added
        # by the caller outside the block
        dwcpe_ref[...] += _cpe_tap_grads_flat(xraw, dxt,
                                              n // img_w, img_w)
        dxt = _cpe_flat(dxt, wcpef_ref[:],
                        jnp.zeros((1, dxt.shape[1]), dxt.dtype),
                        n // img_w, img_w)
    dxt_ref[:] = dxt.astype(dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                              "img_w", "use_cpe"))
def _c_train_fwd_call(x, c, params, cpe, dp, scale, num_heads, img_w,
                      use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wq, bq, wkv, bkv, wp, bp, w1, b1, w2, b2) = params
    rows = _pick_rows_c_fwd(b, n, ch, m)
    g = _c_group(num_heads, d, n)
    dummy = jnp.zeros((8, 128), x.dtype)
    maskc = _bd_mask(n, g, d, x.dtype) if g > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    weights = [wq, _row(bq), wkv, _row(bkv), wp, _row(bp),
               w1, _row(b1), w2, _row(b2), wcpe, bcpe, maskc]
    kernel = functools.partial(
        _c_train_fwd_kernel, scale=float(scale), num_heads=num_heads,
        head_dim=d, rows=rows, n=n, m=m, use_cpe=use_cpe,
        img_w=img_w or 1, g=g)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    co, t1c = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs,
        out_specs=[c_spec, c_spec],
        out_shape=[sd(b * m, ch), sd(b * m, ch)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights)
    return co.reshape(c.shape), t1c


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                              "img_w", "use_cpe"))
def _c_train_bwd_call(x, c, params, cpe, dp, t1c, dco, scale, num_heads,
                      img_w, use_cpe):
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    (wq, bq, wkv, bkv, wp, bp, w1, b1, w2, b2) = params
    rows = _pick_rows_c_bwd(b, n, ch, m, num_heads)
    g = _c_group(num_heads, d, n)
    dummy = jnp.zeros((8, 128), x.dtype)
    maskc = _bd_mask(n, g, d, x.dtype) if g > 1 else dummy
    wcpe, bcpe = _cpe_arrays(cpe, ch, x.dtype)
    dparr = jnp.stack(dp).astype(jnp.float32)
    dco2 = dco.reshape(b * m, ch)
    f32 = jnp.float32
    fast = x.dtype == jnp.bfloat16

    # MLP backward in plain XLA — the c stream is (B*16, C)
    dzc = _xla_do(dco2, dparr[3], m, x.dtype)
    mc = _xla_norm(t1c, x.dtype)
    yc = jax.lax.dot_general(mc, w1, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) + b1.astype(f32)
    gc = _gelu(yc, fast=fast).astype(x.dtype)
    dgg = jax.lax.dot_general(dzc, w2, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dyc = (dgg * _gelu_grad(yc, fast)).astype(x.dtype)
    dmm = jax.lax.dot_general(dyc, w1, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    t132 = t1c.astype(f32)
    mu = jnp.mean(t132, -1, keepdims=True)
    var = jnp.mean(jnp.square(t132 - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    th = (t132 - mu) * inv
    mdm = jnp.mean(dmm, -1, keepdims=True)
    mdt = jnp.mean(dmm * th, -1, keepdims=True)
    dt1c = (dco2.astype(f32)
            + inv * (dmm - mdm - th * mdt)).astype(x.dtype)

    # attention backward kernel
    weights = [wq, _row(bq), wkv, _row(bkv), wp, wcpe, bcpe,
               wcpe[::-1], maskc]
    kernel = functools.partial(
        _c_attn_bwd_kernel, scale=float(scale), num_heads=num_heads,
        head_dim=d, rows=rows, n=n, m=m, use_cpe=use_cpe,
        img_w=img_w or 1, g=g)
    x2 = x.reshape(b * n, ch)
    c2 = c.reshape(b * m, ch)
    x_spec, c_spec, dp_spec, w_specs = _fwd_specs(b, n, m, ch, rows,
                                                  weights)
    acc_specs = [pl.BlockSpec((ch, 2 * ch), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((8, 2 * ch), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((16, ch), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM)]
    acc_shapes = [jax.ShapeDtypeStruct((ch, 2 * ch), f32),
                  jax.ShapeDtypeStruct((8, 2 * ch), f32),
                  jax.ShapeDtypeStruct((16, ch), f32)]
    sd = lambda r_, c_: jax.ShapeDtypeStruct((r_, c_), x.dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[x_spec, c_spec, dp_spec] + w_specs + [c_spec],
        out_specs=[x_spec, c_spec, c_spec, c_spec] + acc_specs,
        out_shape=[sd(b * n, ch), sd(b * m, ch), sd(b * m, ch),
                   sd(b * m, ch)] + acc_shapes,
        scratch_shapes=[pltpu.VMEM((rows * n, 2 * ch), x.dtype)],
        interpret=_pb._INTERPRET,
        **_compiler_params(),
    )(x2, c2, dparr, *weights, dt1c)
    (dxt, dc2, dq, oatt, dwkv, dbkv, dwcpe) = outs
    dbkv = dbkv[0]

    ein = lambda a_, b_: jax.lax.dot_general(
        a_, b_, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    colsum = lambda t: jnp.sum(t.astype(f32), axis=0)
    dw1 = ein(mc, dyc)
    db1 = colsum(dyc)
    dw2 = ein(gc, dzc)
    db2 = colsum(dzc)
    doc = _xla_do(dt1c, dparr[2], m, x.dtype)
    ac = _xla_norm(c, x.dtype).reshape(b * m, ch)
    dwq = ein(ac, dq)
    dbq = colsum(dq)
    dwp = ein(oatt, doc)
    dbp = colsum(doc)
    dparams = (dwq.astype(wq.dtype), dbq.astype(bq.dtype),
               dwkv.astype(wkv.dtype), dbkv.astype(bkv.dtype),
               dwp.astype(wp.dtype), dbp.astype(bp.dtype),
               dw1.astype(w1.dtype), db1.astype(b1.dtype),
               dw2.astype(w2.dtype), db2.astype(b2.dtype))
    dcpe = ((dwcpe[:9].astype(wcpe.dtype), dwcpe[9].astype(bcpe.dtype))
            if use_cpe else None)
    return (dxt.reshape(x.shape), dc2.reshape(c.shape), dparams, dcpe)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _c_train(x, c, params, cpe, dp, scale, num_heads, img_w):
    co, _ = _c_train_fwd_call(x, c, params, cpe, dp, scale, num_heads,
                              img_w, cpe is not None)
    return co


def _c_train_fwd_rule(x, c, params, cpe, dp, scale, num_heads, img_w):
    co, t1c = _c_train_fwd_call(x, c, params, cpe, dp, scale, num_heads,
                                img_w, cpe is not None)
    return co, (x, c, params, cpe, dp, t1c)


def _c_train_bwd_rule(scale, num_heads, img_w, res, dco):
    x, c, params, cpe, dp, t1c = res
    dx, dc, dparams, dcpe = _c_train_bwd_call(
        x, c, params, cpe, dp, t1c, dco.astype(c.dtype), scale,
        num_heads, img_w, cpe is not None)
    ddp = tuple(jnp.zeros_like(s) for s in dp)
    return (dx, dc, dparams, dcpe, ddp)


_c_train.defvjp(_c_train_fwd_rule, _c_train_bwd_rule)


def c_block_train(x, c, params, dp, *, num_heads: int, cpe=None,
                  img_w: int = 0):
    """Fused C-type LeMeBlock TRAINING step (differentiable): returns
    the new c only — x passes through unchanged in the block but gets
    gradients through the k/v projection (and CPE taps when fused).
    params = LN-folded 10-tuple (Wq', bq', Wkv', bkv', Wp, bp, W1', b1',
    W2, b2); dp as in s_block_train (only the c-stream scales, indices
    2/3, are used). Returns None when the shape doesn't qualify."""
    if not HAS_PLTPU:
        return None
    b, n, ch = x.shape
    m = c.shape[1]
    if ch % num_heads != 0 or m % 8 != 0 or n > 4096:
        return None
    if (_pick_rows_c_fwd(b, n, ch, m) == 0
            or _pick_rows_c_bwd(b, n, ch, m, num_heads) == 0):
        return None
    scale = (ch // num_heads) ** -0.5
    return _c_train(x, c, tuple(params),
                    tuple(cpe) if cpe is not None else None,
                    tuple(dp), float(scale), num_heads, img_w)
