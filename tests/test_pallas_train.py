"""Parity tests for the fused TRAINING kernels (attn/pallas_train.py).

The reference is a plain-JAX composition of the same math (LN-folded
weights, shiftless softmax, per-sample DropPath branch scales, fused CPE)
— autodiffed with jax.vjp. The fused custom_vjp must match both outputs
and every gradient. Runs in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lemevit_tpu.attn import pallas_block as pb
from lemevit_tpu.attn import pallas_train as pt

C = 64
H = 2
D = C // H
M = 16


def ref_s_block(x, c, params, cpe, dp, num_heads, img_w):
    """XLA composition matching s_block_train's math exactly."""
    (wqkv, bqkv, wp, bp, w1, b1, w2, b2) = params
    b, n, ch = x.shape
    d = ch // num_heads
    scale = d ** -0.5

    def cpe_apply(t):
        if cpe is None:
            return t
        taps, bias = cpe
        h = n // img_w
        tv = t.reshape(b, h, img_w, ch)
        tp = jnp.pad(tv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros_like(tv) + bias
        for ky in range(3):
            for kx in range(3):
                win = jax.lax.dynamic_slice(tp, (0, ky, kx, 0),
                                            (b, h, img_w, ch))
                acc = acc + win * taps[ky * 3 + kx]
        return (tv + acc).reshape(b, n, ch)

    def norm(t):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.mean(jnp.square(t32 - mu), -1, keepdims=True)
        return (t32 - mu) * jax.lax.rsqrt(var + 1e-6)

    def attn(t):
        a = norm(t).astype(t.dtype)
        qkv = (jnp.einsum("bnc,ck->bnk", a, wqkv)
               + bqkv).reshape(b, t.shape[1], 3, num_heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jnp.exp(jnp.minimum(s, pb._POS_CLIP))
        p = p / jnp.sum(p, -1, keepdims=True)
        o = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))
        o = o.reshape(b, t.shape[1], ch).astype(t.dtype)
        return jnp.einsum("bnc,ck->bnk", o, wp) + bp

    def mlp(t):
        m_ = norm(t).astype(t.dtype)
        y = jnp.einsum("bnc,ch->bnh", m_, w1) + b1
        g = pb._gelu(y.astype(jnp.float32),
                     fast=t.dtype == jnp.bfloat16).astype(t.dtype)
        return jnp.einsum("bnh,hc->bnc", g, w2) + b2

    def branch(t, s1, s2):
        t32 = t.astype(jnp.float32)
        t1 = t32 + s1[:, None, None] * attn(t).astype(jnp.float32)
        t1t = t1.astype(t.dtype)
        out = t1 + s2[:, None, None] * mlp(t1t).astype(jnp.float32)
        return out.astype(t.dtype)

    s1x, s2x, s1c, s2c = dp
    xt = cpe_apply(x)
    return branch(xt, s1x, s2x), branch(c, s1c, s2c)


@pytest.mark.parametrize("use_cpe", [False, True])
def test_s_train_fwd_bwd_matches_reference(use_cpe):
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 16)
        B, n, img_w = 4, 64, 8
        r = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.1
        x = r(0, B, n, C)
        c = r(1, B, M, C)
        params = (r(2, C, 3 * C), r(3, 3 * C), r(4, C, C), r(5, C),
                  r(6, C, 2 * C), r(7, 2 * C), r(8, 2 * C, C), r(9, C))
        cpe = (r(10, 9, C) * 0.2, r(11, C) * 0.2) if use_cpe else None
        keep = 0.7
        dp = tuple(
            jax.random.bernoulli(ks[12 + i], keep, (B,)).astype(
                jnp.float32) / keep
            for i in range(4))

        def fused(x_, c_, params_, cpe_):
            return pt.s_block_train(x_, c_, params_, dp, num_heads=H,
                                    cpe=cpe_, img_w=img_w)

        def ref(x_, c_, params_, cpe_):
            return ref_s_block(x_, c_, params_, cpe_, dp, H, img_w)

        out_f = fused(x, c, params, cpe)
        out_r = ref(x, c, params, cpe)
        for a, b in zip(out_f, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

        # gradient parity: scalar loss over both outputs
        def loss(fn):
            def go(x_, c_, params_, cpe_):
                xo, co = fn(x_, c_, params_, cpe_)
                w = jnp.sin(jnp.arange(xo.size, dtype=jnp.float32)
                            ).reshape(xo.shape)
                wc = jnp.cos(jnp.arange(co.size, dtype=jnp.float32)
                             ).reshape(co.shape)
                return (jnp.sum(xo.astype(jnp.float32) * w)
                        + jnp.sum(co.astype(jnp.float32) * wc))
            return go

        args = (x, c, params, cpe) if use_cpe else (x, c, params)
        if use_cpe:
            gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(*args)
            gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(*args)
        else:
            gf = jax.grad(lambda a, b_, p_: loss(fused)(a, b_, p_, None),
                          argnums=(0, 1, 2))(*args)
            gr = jax.grad(lambda a, b_, p_: loss(ref)(a, b_, p_, None),
                          argnums=(0, 1, 2))(*args)
        flat_f, _ = jax.tree_util.tree_flatten(gf)
        flat_r, _ = jax.tree_util.tree_flatten(gr)
        assert len(flat_f) == len(flat_r)
        for i, (a, b) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
                err_msg=f"grad leaf {i}")
    finally:
        monkey.undo()


def ref_dca_block(x, c, params, cpe, dp, num_heads, scale_x, scale_c,
                  img_w):
    (wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     w1, b1, w2, b2) = params
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads

    def cpe_apply(t):
        if cpe is None:
            return t
        taps, bias = cpe
        h = n // img_w
        tv = t.reshape(b, h, img_w, ch)
        tp = jnp.pad(tv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros_like(tv) + bias
        for ky in range(3):
            for kx in range(3):
                win = jax.lax.dynamic_slice(tp, (0, ky, kx, 0),
                                            (b, h, img_w, ch))
                acc = acc + win * taps[ky * 3 + kx]
        return (tv + acc).reshape(b, n, ch)

    def norm(t):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.mean(jnp.square(t32 - mu), -1, keepdims=True)
        return (t32 - mu) * jax.lax.rsqrt(var + 1e-6)

    def sdpa(q, k, v, scale):
        s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jnp.exp(jnp.minimum(s, pb._POS_CLIP))
        p = p / jnp.sum(p, -1, keepdims=True)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))

    def mlp(t):
        m_ = norm(t).astype(t.dtype)
        y = jnp.einsum("bnc,ch->bnh", m_, w1) + b1
        g = pb._gelu(y.astype(jnp.float32),
                     fast=t.dtype == jnp.bfloat16).astype(t.dtype)
        return jnp.einsum("bnh,hc->bnc", g, w2) + b2

    s1x, s2x, s1c, s2c = dp
    xt = cpe_apply(x)
    xa = norm(xt).astype(x.dtype)
    ca = norm(c).astype(c.dtype)
    qkv1 = (jnp.einsum("bnc,ck->bnk", xa, wqkv1)
            + bqkv1).reshape(b, n, 3, num_heads, d)
    qkv2 = (jnp.einsum("bnc,ck->bnk", ca, wqkv2)
            + bqkv2).reshape(b, m, 3, num_heads, d)
    ox = sdpa(qkv1[:, :, 0], qkv2[:, :, 1], qkv2[:, :, 2],
              scale_x).reshape(b, n, ch).astype(x.dtype)
    oc = sdpa(qkv2[:, :, 0], qkv1[:, :, 1], qkv1[:, :, 2],
              scale_c).reshape(b, m, ch).astype(c.dtype)
    x1 = (xt.astype(jnp.float32) + s1x[:, None, None]
          * (jnp.einsum("bnc,ck->bnk", ox, wpx)
             + bpx).astype(jnp.float32))
    c1 = (c.astype(jnp.float32) + s1c[:, None, None]
          * (jnp.einsum("bnc,ck->bnk", oc, wpc)
             + bpc).astype(jnp.float32))
    xo = x1 + s2x[:, None, None] * mlp(x1.astype(x.dtype)).astype(
        jnp.float32)
    co = c1 + s2c[:, None, None] * mlp(c1.astype(c.dtype)).astype(
        jnp.float32)
    return xo.astype(x.dtype), co.astype(c.dtype)


@pytest.mark.parametrize("use_cpe", [False, True])
def test_dca_train_fwd_bwd_matches_reference(use_cpe):
    from lemevit_tpu.attn import reference as aref
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 20)
        B, n, img_w = 4, 64, 8
        scale_x, scale_c = aref.dca_scales(n, M, C)
        r = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.1
        x = r(0, B, n, C)
        c = r(1, B, M, C)
        params = (r(2, C, 3 * C), r(3, 3 * C), r(4, C, 3 * C), r(5, 3 * C),
                  r(6, C, C), r(7, C), r(8, C, C), r(9, C),
                  r(10, C, 2 * C), r(11, 2 * C), r(12, 2 * C, C), r(13, C))
        cpe = (r(14, 9, C) * 0.2, r(15, C) * 0.2) if use_cpe else None
        keep = 0.7
        dp = tuple(
            jax.random.bernoulli(ks[16 + i], keep, (B,)).astype(
                jnp.float32) / keep
            for i in range(4))

        def fused(x_, c_, params_, cpe_):
            return pt.dca_block_train(
                x_, c_, params_, dp, num_heads=H, scale_x=scale_x,
                scale_c=scale_c, cpe=cpe_, img_w=img_w)

        def ref(x_, c_, params_, cpe_):
            return ref_dca_block(x_, c_, params_, cpe_, dp, H,
                                 scale_x, scale_c, img_w)

        out_f = fused(x, c, params, cpe)
        assert out_f is not None
        out_r = ref(x, c, params, cpe)
        for a, b in zip(out_f, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

        def loss(fn):
            def go(x_, c_, params_, cpe_):
                xo, co = fn(x_, c_, params_, cpe_)
                w = jnp.sin(jnp.arange(xo.size, dtype=jnp.float32)
                            ).reshape(xo.shape)
                wc = jnp.cos(jnp.arange(co.size, dtype=jnp.float32)
                             ).reshape(co.shape)
                return (jnp.sum(xo.astype(jnp.float32) * w)
                        + jnp.sum(co.astype(jnp.float32) * wc))
            return go

        if use_cpe:
            gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(
                x, c, params, cpe)
            gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(
                x, c, params, cpe)
        else:
            gf = jax.grad(lambda a, b_, p_: loss(fused)(a, b_, p_, None),
                          argnums=(0, 1, 2))(x, c, params)
            gr = jax.grad(lambda a, b_, p_: loss(ref)(a, b_, p_, None),
                          argnums=(0, 1, 2))(x, c, params)
        flat_f, _ = jax.tree_util.tree_flatten(gf)
        flat_r, _ = jax.tree_util.tree_flatten(gr)
        assert len(flat_f) == len(flat_r)
        for i, (a, b) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
                err_msg=f"grad leaf {i}")
    finally:
        monkey.undo()


def test_model_train_fused_matches_unfused():
    """Full LeMeBlock train path: fused-train kernels vs the unfused XLA
    composition (drop_path=0 so the stochastic masks are all ones)."""
    from lemevit_tpu.models.lemevit import LeMeBlock
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        for attn_type in ("S", "D", "D2"):
            # D2 rides the DCA train kernel via the [Wq|Wq|Wv1]/[Wk|Wk|Wv2]
            # weight permutation (_d2_as_dca_weights); grads for the shared
            # q/k chain through the outside-kernel concat
            blk_x = LeMeBlock(dim=C, num_heads=H, attn_type=attn_type,
                              attn_backend="xla")
            blk_p = LeMeBlock(dim=C, num_heads=H, attn_type=attn_type,
                              attn_backend="pallas")
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C))
            c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, C))
            v = blk_x.init(jax.random.PRNGKey(2), x, c)

            def loss(fn_vars, blk):
                xo, co = blk.apply(fn_vars, x, c, False)  # train mode
                return (jnp.sum(xo.astype(jnp.float32) ** 2)
                        + jnp.sum(co.astype(jnp.float32) ** 2))

            lx, gx = jax.value_and_grad(loss)(v, blk_x)
            lp, gp = jax.value_and_grad(loss)(v, blk_p)
            np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4)
            fx, _ = jax.tree_util.tree_flatten(gx)
            fp, _ = jax.tree_util.tree_flatten(gp)
            for i, (a, b) in enumerate(zip(fx, fp)):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
                    err_msg=f"{attn_type} grad leaf {i}")
    finally:
        monkey.undo()


@pytest.mark.fast
def test_fused_train_grad_traces_in_bf16():
    """bf16 dtype-path regression: the fused grad must TRACE with bf16
    activations + CPE (the production TPU configuration). Round-3 found
    a conv-backward-filter dtype mismatch here that fp32-only CPU tests
    missed — this traces (interpret mode, tiny shapes) in bf16."""
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 12)
        B, n, img_w = 2, 16, 4
        bf = jnp.bfloat16
        r = lambda i, *s: (jax.random.normal(ks[i], s, jnp.float32)
                           * 0.1).astype(bf)
        x = r(0, B, n, C)
        c = r(1, B, M, C)
        params = (r(2, C, 3 * C), r(3, 3 * C), r(4, C, C), r(5, C),
                  r(6, C, 2 * C), r(7, 2 * C), r(8, 2 * C, C), r(9, C))
        cpe = (r(10, 9, C), jnp.zeros((C,), bf))
        ones = jnp.ones((B,), jnp.float32)
        dp = (ones, ones, ones, ones)

        def loss(x_, params_, cpe_):
            out = pt.s_block_train(x_, c, params_, dp, num_heads=H,
                                   cpe=cpe_, img_w=img_w)
            assert out is not None
            xo, co = out
            return (jnp.sum(xo.astype(jnp.float32) ** 2)
                    + jnp.sum(co.astype(jnp.float32) ** 2))

        g = jax.grad(loss, argnums=(0, 1, 2))(x, params, cpe)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()
    finally:
        monkey.undo()


def ref_c_block(x, c, params, cpe, dp, num_heads, img_w):
    """XLA reference of the C-type train block: q from c, k/v from the
    CPE-shifted x; only c updates (x passes through outside)."""
    (wq, bq, wkv, bkv, wp, bp, w1, b1, w2, b2) = params
    b, n, ch = x.shape
    m = c.shape[1]
    d = ch // num_heads
    scale = d ** -0.5

    def norm(t):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.mean(jnp.square(t32 - mu), -1, keepdims=True)
        return (t32 - mu) * jax.lax.rsqrt(var + 1e-6)

    def cpe_apply(t):
        if cpe is None:
            return t
        taps, bias = cpe
        h = n // img_w
        tv = t.reshape(b, h, img_w, ch)
        tp = jnp.pad(tv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros_like(tv) + bias.astype(t.dtype)
        for ky in range(3):
            for kx in range(3):
                win = jax.lax.dynamic_slice(
                    tp, (0, ky, kx, 0), (b, h, img_w, ch))
                acc = acc + win * taps[ky * 3 + kx].astype(t.dtype)
        return (tv + acc).reshape(b, n, ch)

    from lemevit_tpu.attn import reference as aref
    xt = cpe_apply(x)
    xa = norm(xt).astype(x.dtype)
    ca = norm(c).astype(x.dtype)
    kv = (jnp.einsum("bnc,ck->bnk", xa, wkv) + bkv).reshape(
        b, n, 2, num_heads, d)
    q = (jnp.einsum("bmc,ck->bmk", ca, wq) + bq).reshape(
        b, m, num_heads, d)
    o = aref.sdpa_bnhd(q, kv[:, :, 0], kv[:, :, 1],
                       scale=scale).reshape(b, m, ch)
    t1 = c.astype(jnp.float32) + dp[2][:, None, None] * (
        jnp.einsum("bmc,ck->bmk", o.astype(x.dtype), wp)
        + bp).astype(jnp.float32)
    t1t = t1.astype(x.dtype)
    mm = norm(t1t).astype(x.dtype)
    from lemevit_tpu.attn.pallas_block import _gelu
    y = jnp.einsum("bmc,ch->bmh", mm, w1) + b1
    gg = _gelu(y.astype(jnp.float32),
               fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    out = t1 + dp[3][:, None, None] * (
        jnp.einsum("bmh,hc->bmc", gg, w2) + b2).astype(jnp.float32)
    return out.astype(x.dtype)


@pytest.mark.parametrize("use_cpe", [False, True])
def test_c_train_fwd_bwd_matches_reference(use_cpe):
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        key = jax.random.PRNGKey(7)
        ks = jax.random.split(key, 16)
        B, n, img_w = 4, 64, 8
        r = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.1
        x = r(0, B, n, C)
        c = r(1, B, M, C)
        params = (r(2, C, C), r(3, C), r(4, C, 2 * C), r(5, 2 * C),
                  r(6, C, C), r(7, C),
                  r(8, C, 2 * C), r(9, 2 * C), r(10, 2 * C, C), r(11, C))
        cpe = (r(12, 9, C) * 0.2, r(13, C) * 0.2) if use_cpe else None
        keep = 0.7
        dp = tuple(
            jax.random.bernoulli(ks[14], keep, (B,)).astype(
                jnp.float32) / keep
            for _ in range(4))

        def fused(x_, c_, params_, cpe_):
            out = pt.c_block_train(x_, c_, params_, dp, num_heads=H,
                                   cpe=cpe_, img_w=img_w)
            assert out is not None
            return out

        def ref(x_, c_, params_, cpe_):
            return ref_c_block(x_, c_, params_, cpe_, dp, H, img_w)

        out_f = fused(x, c, params, cpe)
        out_r = ref(x, c, params, cpe)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=2e-4, atol=2e-4)

        def loss(fn):
            def go(x_, c_, params_, cpe_):
                co = fn(x_, c_, params_, cpe_)
                wc = jnp.cos(jnp.arange(co.size, dtype=jnp.float32)
                             ).reshape(co.shape)
                return jnp.sum(co.astype(jnp.float32) * wc)
            return go

        if use_cpe:
            gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(
                x, c, params, cpe)
            gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(
                x, c, params, cpe)
        else:
            gf = jax.grad(lambda a, b_, p_: loss(fused)(a, b_, p_, None),
                          argnums=(0, 1, 2))(x, c, params)
            gr = jax.grad(lambda a, b_, p_: loss(ref)(a, b_, p_, None),
                          argnums=(0, 1, 2))(x, c, params)
        flat_f, _ = jax.tree_util.tree_flatten(gf)
        flat_r, _ = jax.tree_util.tree_flatten(gr)
        assert len(flat_f) == len(flat_r)
        for i, (a, b) in enumerate(zip(flat_f, flat_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
                err_msg=f"grad leaf {i}")
    finally:
        monkey.undo()


def test_model_c_train_fused_matches_unfused():
    """End-to-end: a C-type LeMeBlock in train mode routes through
    c_block_train and matches the XLA composition's loss and grads."""
    from lemevit_tpu.models.lemevit import LeMeBlock
    monkey = pytest.MonkeyPatch()
    monkey.setattr(pb, "_INTERPRET", True)
    try:
        blk_x = LeMeBlock(dim=C, num_heads=H, attn_type="C",
                          attn_backend="xla")
        blk_p = LeMeBlock(dim=C, num_heads=H, attn_type="C",
                          attn_backend="pallas")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C))
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, C))
        v = blk_x.init(jax.random.PRNGKey(2), x, c)

        def loss(fn_vars, blk):
            xo, co = blk.apply(fn_vars, x, c, False)  # train mode
            return (jnp.sum(xo.astype(jnp.float32) ** 2)
                    + jnp.sum(co.astype(jnp.float32) ** 2))

        lx, gx = jax.value_and_grad(loss)(v, blk_x)
        lp, gp = jax.value_and_grad(loss)(v, blk_p)
        np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4)
        fx, _ = jax.tree_util.tree_flatten(gx)
        fp, _ = jax.tree_util.tree_flatten(gp)
        for i, (a, b) in enumerate(zip(fx, fp)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3,
                err_msg=f"C grad leaf {i}")
    finally:
        monkey.undo()
