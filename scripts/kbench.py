"""Per-stage fused-block kernel microbenchmark (run as the ONLY TPU client).

Times one LeMeBlock per stage shape of lemevit_base @ bs256, comparing the
fused Pallas kernels against the unfused XLA composition. Drives the kernel
perf work with measured numbers instead of theory.

  python -u scripts/kbench.py [--stages 0,1,2,3,4] [--reps 50]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# lemevit_base stage shapes @ 224^2, bs 256, head_dim 32, M=16 meta tokens
# (attn ["C","D","D","S","S"], dims [96,96,192,384,512], depth [2,4,4,18,4])
STAGES = [
    dict(idx=0, attn="C", n=3136, c=96, heads=3, blocks=2),
    dict(idx=1, attn="D", n=3136, c=96, heads=3, blocks=4),
    dict(idx=2, attn="D", n=784, c=192, heads=6, blocks=4),
    dict(idx=3, attn="S", n=196, c=384, heads=12, blocks=18),
    dict(idx=4, attn="S", n=49, c=512, heads=16, blocks=4),
]
B = 256
M = 16


def timeit(f, *a, reps=50):
    # NB: block_until_ready is unreliable through the axon tunnel -- force a
    # real device-to-host copy to fence, but of a single SCALAR (copying the
    # full activation through the tunnel would dominate the measurement).
    def fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(leaf[(0,) * leaf.ndim])
    fence(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    fence(r)
    return (time.perf_counter() - t0) / reps


def make_params(key, c, attn, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 24)
    i = iter(range(24))
    r = lambda *s: (jax.random.normal(ks[next(i)], s, jnp.float32)
                    * 0.02).astype(dtype)
    ones = jnp.ones((c,), jnp.float32)
    zeros = jnp.zeros((c,), jnp.float32)
    hidden = 4 * c
    if attn == "S":
        return (ones, zeros, r(c, 3 * c), r(3 * c), r(c, c), r(c),
                ones, zeros, r(c, hidden), r(hidden), r(hidden, c), r(c))
    if attn == "C":
        return (ones, zeros, r(c, c), r(c), r(c, 2 * c), r(2 * c),
                r(c, c), r(c), ones, zeros,
                r(c, hidden), r(hidden), r(hidden, c), r(c))
    # D
    return (ones, zeros, r(c, 3 * c), r(3 * c), r(c, 3 * c), r(3 * c),
            r(c, c), r(c), r(c, c), r(c), ones, zeros,
            r(c, hidden), r(hidden), r(hidden, c), r(c))


def xla_block(x, c, params, attn, heads, scale_x=None, scale_c=None):
    """Unfused reference composition of the same block (pre-norm)."""
    from lemevit_tpu.attn import reference as ref

    def ln(t, s, b):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.var(t32, -1, keepdims=True)
        return (((t32 - mu) * jax.lax.rsqrt(var + 1e-6)) * s + b).astype(t.dtype)

    def mlp_res(t, ln2s, ln2b, w1, b1, w2, b2):
        m = ln(t, ln2s, ln2b)
        y = jnp.dot(m, w1) + b1
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(t.dtype)
        return t + jnp.dot(y, w2) + b2

    bsz, n, ch = x.shape
    d = ch // heads
    if attn == "S":
        (ln1s, ln1b, wqkv, bqkv, wp, bp, ln2s, ln2b, w1, b1, w2, b2) = params

        def branch(t):
            a = ln(t, ln1s, ln1b)
            qkv = (jnp.dot(a, wqkv) + bqkv).reshape(
                bsz, t.shape[1], 3, heads, d)
            o = ref.sdpa_bnhd(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
            o = o.reshape(bsz, t.shape[1], ch)
            t = t + jnp.dot(o, wp) + bp
            return mlp_res(t, ln2s, ln2b, w1, b1, w2, b2)
        return branch(x), branch(c)
    if attn == "C":
        (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
         w1, b1, w2, b2) = params
        xa, ca = ln(x, ln1s, ln1b), ln(c, ln1s, ln1b)
        q = (jnp.dot(ca, wq) + bq).reshape(bsz, M, heads, d)
        kv = (jnp.dot(xa, wkv) + bkv).reshape(bsz, n, 2, heads, d)
        o = ref.sdpa_bnhd(q, kv[:, :, 0], kv[:, :, 1]).reshape(bsz, M, ch)
        c1 = c + jnp.dot(o, wp) + bp
        return mlp_res(c1, ln2s, ln2b, w1, b1, w2, b2)
    # D
    (ln1s, ln1b, wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     ln2s, ln2b, w1, b1, w2, b2) = params
    xa, ca = ln(x, ln1s, ln1b), ln(c, ln1s, ln1b)
    qkv1 = (jnp.dot(xa, wqkv1) + bqkv1).reshape(bsz, n, 3, heads, d)
    qkv2 = (jnp.dot(ca, wqkv2) + bqkv2).reshape(bsz, M, 3, heads, d)
    ox = ref.sdpa_bnhd(qkv1[:, :, 0], qkv2[:, :, 1], qkv2[:, :, 2],
                       scale=scale_x).reshape(bsz, n, ch)
    oc = ref.sdpa_bnhd(qkv2[:, :, 0], qkv1[:, :, 1], qkv1[:, :, 2],
                       scale=scale_c).reshape(bsz, M, ch)
    x1 = x + jnp.dot(ox, wpx) + bpx
    c1 = c + jnp.dot(oc, wpc) + bpc
    return (mlp_res(x1, ln2s, ln2b, w1, b1, w2, b2),
            mlp_res(c1, ln2s, ln2b, w1, b1, w2, b2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="0,1,2,3,4")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--impls", default="pallas,xla")
    args = ap.parse_args()
    want = {int(s) for s in args.stages.split(",")}
    impls = args.impls.split(",")

    from lemevit_tpu.attn import pallas_block
    from lemevit_tpu.attn import reference as aref

    key = jax.random.PRNGKey(0)
    for st in STAGES:
        if st["idx"] not in want:
            continue
        n, ch, heads, attn = st["n"], st["c"], st["heads"], st["attn"]
        kx, kc, kp = jax.random.split(jax.random.fold_in(key, st["idx"]), 3)
        x = jax.random.normal(kx, (B, n, ch), jnp.bfloat16)
        c = jax.random.normal(kc, (B, M, ch), jnp.bfloat16)
        params = make_params(kp, ch, attn)
        scale_x, scale_c = aref.dca_scales(n, M, ch)

        for impl in impls:
            try:
                if impl == "xla":
                    f = jax.jit(functools.partial(
                        xla_block, attn=attn, heads=heads,
                        scale_x=scale_x, scale_c=scale_c))
                    dt = timeit(f, x, c, params, reps=args.reps)
                else:
                    if attn == "S":
                        fn = functools.partial(pallas_block.s_block,
                                               num_heads=heads)
                    elif attn == "C":
                        fn = functools.partial(pallas_block.c_block,
                                               num_heads=heads)
                    else:
                        fn = functools.partial(
                            pallas_block.dca_block, num_heads=heads,
                            scale_x=scale_x, scale_c=scale_c)
                    out = fn(x, c, params)
                    if out is None:
                        print(f"stage{st['idx']} {attn} {impl}: not fusable")
                        continue
                    dt = timeit(lambda xx, cc: fn(xx, cc, params), x, c,
                                reps=args.reps)
                per_stage = dt * st["blocks"] * 1000
                print(f"stage{st['idx']} {attn} N={n} C={ch} H={heads} "
                      f"{impl:7s}: {dt*1e3:7.3f} ms/block "
                      f"-> {per_stage:7.2f} ms/stage", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"stage{st['idx']} {attn} {impl}: ERROR "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
