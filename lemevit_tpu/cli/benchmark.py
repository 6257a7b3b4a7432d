"""Throughput benchmark CLI (the reference benchmark.py contract:
--bench inference|train|both, samples/sec + ms/step + param count + GMACs,
--result JSON on stdout, OOM batch-decay retry;
/root/reference/benchmark.py:320-889).

Usage:
  python -m lemevit_tpu.cli.benchmark --model lemevit_base --bench both
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lemevit_tpu benchmark")
    p.add_argument("--model", default="lemevit_base")
    p.add_argument("--attn-backend", default="auto",
                   choices=["auto", "pallas", "xla"],
                   help="attention/block kernel dispatch: 'xla' bypasses "
                        "the fused Pallas kernels (escape hatch)")
    p.add_argument("--bench", default="inference",
                   choices=["inference", "train", "both", "profile"])
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--num-warm-iter", type=int, default=3)
    p.add_argument("--num-bench-iter", type=int, default=30)
    p.add_argument("--bf16", action="store_true", default=None)
    p.add_argument("--results-file", default="")
    return p


def _count_params(variables) -> float:
    import jax
    return sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))


def _flops_estimate(fn, *args) -> float:
    """Analytic MACs via XLA cost analysis (replaces deepspeed/fvcore
    profiling in the reference). Prefers the CPU backend — the TPU tunnel's
    AOT compile reports unreliable flop counts."""
    import jax
    for backend in ("cpu", None):
        try:
            jitted = jax.jit(fn, backend=backend) if backend else jax.jit(fn)
            analysis = jitted.lower(*args).compile().cost_analysis()
            if analysis and analysis.get("flops", 0) > 0:
                return float(analysis["flops"])
        except Exception:
            continue
    return float("nan")


def _force(out):
    """Force materialization with a host readback (block_until_ready alone
    is not trustworthy on the axon tunnel platform)."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf.sum() if hasattr(leaf, "sum") else leaf))


def _timed(fn, variables, x, n_warm, n_iter):
    for _ in range(max(n_warm, 1)):
        _force(fn(variables, x))
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn(variables, x)
    _force(out)
    return (time.perf_counter() - t0) / n_iter


def run_inference(args, model, variables, x) -> dict:
    import jax

    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    step_time = _timed(fwd, variables, x, args.num_warm_iter,
                       args.num_bench_iter)
    return {
        "samples_per_sec": round(args.batch_size / step_time, 2),
        "step_time": round(step_time * 1000, 3),
        "batch_size": args.batch_size,
        "img_size": args.img_size,
    }


def run_train(args, model, variables, x) -> dict:
    import jax
    import jax.numpy as jnp

    from lemevit_tpu.train import build_optimizer, make_train_step
    from lemevit_tpu.train.state import TrainState

    tx = build_optimizer(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        apply_fn=model.apply, tx=tx)
    labels = jnp.asarray(
        np.random.RandomState(0).randint(0, args.num_classes,
                                         args.batch_size), jnp.int32)
    train_step = jax.jit(make_train_step(), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)

    def run(state):
        state, metrics = train_step(state, {"image": x, "label": labels}, rng)
        return state, metrics

    state, metrics = run(state)
    _force(metrics)
    t0 = time.perf_counter()
    for _ in range(args.num_bench_iter):
        state, metrics = run(state)
    _force(metrics)
    dt = (time.perf_counter() - t0) / args.num_bench_iter

    # fwd-only time for the fwd/bwd+opt breakdown (the reference's
    # TrainBenchmarkRunner surface, benchmark.py:549-670)
    fwd = jax.jit(lambda v, xx: model.apply(
        {"params": v, "batch_stats": state.batch_stats} if
        jax.tree.leaves(state.batch_stats) else {"params": v},
        xx, train=False))
    _force(fwd(state.params, x))
    t0 = time.perf_counter()
    for _ in range(args.num_bench_iter):
        out = fwd(state.params, x)
    _force(out)
    dt_fwd = (time.perf_counter() - t0) / args.num_bench_iter
    return {
        "samples_per_sec": round(args.batch_size / dt, 2),
        "step_time": round(dt * 1000, 3),
        "fwd_time": round(dt_fwd * 1000, 3),
        "bwd_opt_time": round((dt - dt_fwd) * 1000, 3),
        "batch_size": args.batch_size,
    }


def benchmark(args) -> dict:
    import jax
    import jax.numpy as jnp

    from lemevit_tpu.models import create_model

    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    results = {"model": args.model}
    batch_size = args.batch_size
    while batch_size >= 1:
        try:
            args.batch_size = batch_size
            model = create_model(
                args.model, num_classes=args.num_classes,
                attn_backend=args.attn_backend,
                dtype=jnp.bfloat16 if bf16 else jnp.float32)
            rng = jax.random.PRNGKey(0)
            x = jax.random.normal(
                rng, (batch_size, args.img_size, args.img_size, 3),
                jnp.float32)
            variables = jax.jit(model.init)(rng, x[:1])
            results["param_count"] = round(_count_params(variables) / 1e6, 2)
            fwd = lambda v, xx: model.apply(v, xx, train=False)
            flops = _flops_estimate(fwd, variables, x[:1])
            if np.isfinite(flops):
                results["gmacs"] = round(flops / 2 / 1e9, 2)
            if args.bench in ("inference", "both", "profile"):
                results["inference"] = run_inference(args, model, variables, x)
            if args.bench in ("train", "both"):
                results["train"] = run_train(args, model, variables, x)
            break
        except (RuntimeError, jax.errors.JaxRuntimeError) as e:
            if "RESOURCE_EXHAUSTED" in str(e) and batch_size > 1:
                batch_size //= 2  # OOM retry with batch decay
                continue
            raise
    return results


def main(argv=None):
    args = build_parser().parse_args(argv)
    results = benchmark(args)
    if args.results_file:
        with open(args.results_file, "w") as f:
            json.dump(results, f, indent=2)
    print(f"--result\n{json.dumps(results, indent=2)}")
    return results


if __name__ == "__main__":
    main()
