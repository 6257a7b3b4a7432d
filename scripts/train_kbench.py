"""Per-stage TRAIN kernel microbenchmark (run as the ONLY TPU client).

For each lemevit_base stage shape @ bs256, times the fused Pallas
training block (fwd alone and full value_and_grad) against the unfused
XLA composition, across a sweep of scoped-VMEM budgets (which select the
backward row folds). This drives the hybrid fwd/bwd routing decision:
the fused forward can win while the fused backward loses, and the two
are gated together in s_block_train/dca_block_train.

  python -u scripts/train_kbench.py [--stages 1,2,3,4] [--budgets 14.5,24,36,56]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbench import STAGES, B, M, timeit, make_params, xla_block  # noqa: E402


def fused_params(params, attn):
    """kbench 12/16-tuple -> LN-folded fused-train tuple (8 for S, 12
    for D), mirroring models/lemevit.py::_try_fused_train."""
    from lemevit_tpu.attn import pallas_block as pb
    if attn == "S":
        (ln1s, ln1b, wqkv, bqkv, wp, bp, ln2s, ln2b, w1, b1, w2, b2) = params
        wqkv_f, bqkv_f = pb._fold_ln(ln1s, ln1b, wqkv, bqkv)
        w1_f, b1_f = pb._fold_ln(ln2s, ln2b, w1, b1)
        return (wqkv_f, bqkv_f, wp, bp, w1_f, b1_f, w2, b2)
    if attn == "C":
        (ln1s, ln1b, wq, bq, wkv, bkv, wp, bp, ln2s, ln2b,
         w1, b1, w2, b2) = params
        wq_f, bq_f = pb._fold_ln(ln1s, ln1b, wq, bq)
        wkv_f, bkv_f = pb._fold_ln(ln1s, ln1b, wkv, bkv)
        w1_f, b1_f = pb._fold_ln(ln2s, ln2b, w1, b1)
        return (wq_f, bq_f, wkv_f, bkv_f, wp, bp, w1_f, b1_f, w2, b2)
    (ln1s, ln1b, wqkv1, bqkv1, wqkv2, bqkv2, wpx, bpx, wpc, bpc,
     ln2s, ln2b, w1, b1, w2, b2) = params
    wq1_f, bq1_f = pb._fold_ln(ln1s, ln1b, wqkv1, bqkv1)
    wq2_f, bq2_f = pb._fold_ln(ln1s, ln1b, wqkv2, bqkv2)
    w1_f, b1_f = pb._fold_ln(ln2s, ln2b, w1, b1)
    return (wq1_f, bq1_f, wq2_f, bq2_f, wpx, bpx, wpc, bpc,
            w1_f, b1_f, w2, b2)


def run_stage(st, budgets, reps, use_cpe=False, ext_cpe=False):
    from lemevit_tpu.attn import pallas_train as pt
    from lemevit_tpu.attn import reference as aref

    n, ch, heads, attn = st["n"], st["c"], st["heads"], st["attn"]
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, n, ch), jnp.float32) * 0.5
         ).astype(jnp.bfloat16)
    c = (jax.random.normal(key, (B, M, ch), jnp.float32) * 0.5
         ).astype(jnp.bfloat16)
    params = make_params(key, ch, attn)
    fp = fused_params(params, attn)
    ones = jnp.ones((B,), jnp.float32)
    dp = (ones, ones, ones, ones)
    scale_x = scale_c = None
    if attn == "D":
        scale_x, scale_c = aref.dca_scales(n, M, ch)
    img_w = int(round(n ** 0.5))
    cpe = None
    if use_cpe:
        cpe = ((jax.random.normal(key, (9, ch), jnp.float32) * 0.02
                ).astype(jnp.bfloat16),
               jnp.zeros((ch,), jnp.bfloat16))

    def loss_of(out):
        if not isinstance(out, tuple):
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
        xo, co = out
        return (jnp.sum(xo.astype(jnp.float32) ** 2)
                + jnp.sum(co.astype(jnp.float32) ** 2)) * 1e-6

    # ---- XLA baseline (with the depthwise-3x3 CPE when --cpe)
    def xla_cpe(xx):
        if cpe is None:
            return xx
        taps, bias = cpe
        img = xx.reshape(B, img_w, img_w, ch)
        k = taps.reshape(3, 3, 1, ch).astype(xx.dtype)
        y = jax.lax.conv_general_dilated(
            img, k, (1, 1), "SAME", feature_group_count=ch,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return xx + (y + bias).reshape(B, n, ch)

    def xla_loss(xx, pp):
        return loss_of(xla_block(xla_cpe(xx), c, pp, attn, heads,
                                 scale_x=scale_x, scale_c=scale_c))

    fwd_x = jax.jit(lambda xx, pp: loss_of(
        xla_block(xla_cpe(xx), c, pp, attn, heads,
                  scale_x=scale_x, scale_c=scale_c)))
    grad_x = jax.jit(jax.grad(xla_loss, argnums=(0, 1)))
    t_fx = timeit(fwd_x, x, params, reps=reps) * 1e3
    t_gx = timeit(grad_x, x, params, reps=reps) * 1e3
    nb = st["blocks"]
    print(f"stage{st['idx']} {attn} N={n} C={ch} XLA: fwd {t_fx:.2f} "
          f"grad {t_gx:.2f} ms/block (x{nb})", flush=True)

    # ---- fused sweep over budgets
    for budget in budgets:
        os.environ["PB_TRAIN_BWD_MB"] = str(budget)

        def fused(xx, cc, pp):
            kcpe = None if ext_cpe else cpe
            if ext_cpe:  # external XLA dwconv, fused kernels CPE-free
                xx = xla_cpe(xx)
            if attn == "S":
                out = pt.s_block_train(xx, cc, pp, dp, num_heads=heads,
                                       cpe=kcpe, img_w=img_w)
            elif attn == "C":
                out = pt.c_block_train(xx, cc, pp, dp, num_heads=heads,
                                       cpe=kcpe, img_w=img_w)
            else:
                out = pt.dca_block_train(xx, cc, pp, dp, num_heads=heads,
                                         scale_x=scale_x, scale_c=scale_c,
                                         cpe=kcpe, img_w=img_w)
            return out

        probe = fused(x, c, fp)
        if probe is None:
            print(f"  budget {budget}: fused path rejected", flush=True)
            continue
        fwd_f = jax.jit(lambda xx, pp: loss_of(fused(xx, c, pp)))
        grad_f = jax.jit(jax.grad(
            lambda xx, pp: loss_of(fused(xx, c, pp)), argnums=(0, 1)))
        try:
            t_ff = timeit(fwd_f, x, fp, reps=reps) * 1e3
            t_gf = timeit(grad_f, x, fp, reps=reps) * 1e3
        except Exception as e:  # noqa: BLE001 — compile crash = data point
            print(f"  budget {budget}: ERROR {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        hyb = t_ff + (t_gx - t_fx)
        print(f"  budget {budget}: fused fwd {t_ff:.2f} grad {t_gf:.2f} "
              f"| hybrid(fused-fwd+XLA-bwd) ~{hyb:.2f} ms/block", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="1,2,3,4")
    ap.add_argument("--budgets", default="14.5,24,36,56")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpe", action="store_true",
                    help="include the fused 3x3 CPE (the model default)")
    ap.add_argument("--cpe-ext", action="store_true",
                    help="CPE as an external XLA dwconv; fused kernels "
                         "run CPE-free (candidate training default)")
    args = ap.parse_args()
    budgets = [float(b) for b in args.budgets.split(",")]
    wanted = {int(s) for s in args.stages.split(",")}
    for st in STAGES:
        if st["idx"] in wanted:
            run_stage(st, budgets, args.reps,
                      use_cpe=args.cpe or args.cpe_ext,
                      ext_cpe=args.cpe_ext)


if __name__ == "__main__":
    main()
