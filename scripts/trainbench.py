"""Training-step benchmark + compile gate for the fused train kernels.

Default: time inference fwd / train fwd / full value_and_grad for
tiny/small/base @ bs256 on the current backend, write TRAINBENCH.json
at the repo root, and EXIT NONZERO if any model fails to compile or
run (the round-2 failure mode was a scoped-VMEM compile crash that
only manifested on real TPU hardware — this script is the on-chip
gate; tests/test_train_compile.py wraps it for pytest).

--stages: per-stage grad cost of lemevit_base via truncated depths
(the difference between consecutive cuts isolates each stage's
fwd+bwd block cost as XLA schedules it).

--models / --batch-size to narrow the sweep.
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, *a, reps=10):
    def fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])
    fence(f(*a))
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = f(*a)
    fence(r)
    return (time.perf_counter() - t0) / reps


def bench_model(name, batch_size, img=224, reps=10):
    from lemevit_tpu.models import create_model

    model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch_size, img, img, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch_size,), 0, 1000)
    variables = jax.jit(model.init)(rng, x[:1])
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    @jax.jit
    def fwd_infer(p, xx):
        return model.apply({"params": p, "batch_stats": stats}, xx,
                           train=False)

    @jax.jit
    def fwd_train(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return out

    def loss(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], 1).mean()

    grad = jax.jit(jax.grad(loss))

    r = {"batch_size": batch_size}
    r["fwd_infer_ms"] = round(timeit(fwd_infer, params, x, reps=reps) * 1e3, 2)
    r["fwd_train_ms"] = round(timeit(fwd_train, params, x, reps=reps) * 1e3, 2)
    r["grad_ms"] = round(timeit(grad, params, x, reps=reps) * 1e3, 2)
    r["bwd_only_ms"] = round(r["grad_ms"] - r["fwd_train_ms"], 2)
    r["train_img_per_sec"] = round(batch_size / (r["grad_ms"] / 1e3), 1)
    return r


def bench_stages(batch_size):
    """Truncated-depth grad profiling of lemevit_base."""
    from lemevit_tpu.models.lemevit import LeMeViT

    base = dict(embed_dim=(96, 96, 192, 384, 512), head_dim=32,
                mlp_ratios=(4, 4, 4, 4, 4),
                attn_type=("C", "D", "D", "S", "S"),
                queries_len=16, num_classes=1000, dtype=jnp.bfloat16)
    full = (2, 4, 4, 18, 4)
    cuts = [tuple(full[:i] + (0,) * (5 - i)) for i in range(6)]
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch_size, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch_size,), 0, 1000)
    out = {}
    prev = None
    for i, depths in enumerate(cuts):
        model = LeMeViT(depth=depths, **base)
        variables = jax.jit(model.init)(rng, x[:1])
        params, stats = variables["params"], variables.get("batch_stats", {})

        def loss(p, xx):
            o, _ = model.apply(
                {"params": p, "batch_stats": stats}, xx, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            logp = jax.nn.log_softmax(o.astype(jnp.float32))
            return -jnp.take_along_axis(logp, labels[:, None], 1).mean()

        t = timeit(jax.jit(jax.grad(loss)), params, x) * 1e3
        key = "plumbing" if i == 0 else f"stage{i - 1}"
        out[key] = round(t if prev is None else t - prev, 2)
        out[f"_cut{i}_total"] = round(t, 2)
        prev = t
        print(f"{key}: {out[key]:.2f} ms (cumulative {t:.2f})", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*",
                    default=["lemevit_tiny", "lemevit_small", "lemevit_base",
                             "lemevit_tiny_v2", "lemevit_small_v2",
                             "vit_tiny"])
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if not args.out:  # --stages must not clobber the variant bench
        args.out = os.path.join(os.path.dirname(__file__), "..",
                                "TRAINSTAGES.json" if args.stages
                                else "TRAINBENCH.json")

    results = {"backend": jax.default_backend(),
               "batch_size": args.batch_size}
    failed = []
    if args.stages:
        try:
            results["stages_base"] = bench_stages(args.batch_size)
        except Exception:
            traceback.print_exc()
            failed.append("stages")
    else:
        for name in args.models:
            try:
                results[name] = bench_model(name, args.batch_size)
                print(f"{name}: {json.dumps(results[name])}", flush=True)
            except Exception:
                traceback.print_exc()
                failed.append(name)
    results["failed"] = failed
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), flush=True)
    if failed:
        print(f"FAILED: {failed}", file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
