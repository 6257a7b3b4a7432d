"""Decompose training-step cost of lemevit_base @ bs256 on one chip.

Times: (a) inference fwd (fused kernels), (b) train-mode fwd (unfused XLA),
(c) full value_and_grad, (d) grad of attention-only / mlp-only ablations.
Drives the fused-backward work with measured numbers.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, *a, reps=10):
    def fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(leaf.reshape(-1)[0])
    fence(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    fence(r)
    return (time.perf_counter() - t0) / reps


def main():
    from lemevit_tpu.models import create_model

    model = create_model("lemevit_base", num_classes=1000,
                         dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (256, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (256,), 0, 1000)
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

    r = {}
    r["fwd_infer_ms"] = timeit(fwd_infer, params, x) * 1e3
    r["fwd_train_ms"] = timeit(fwd_train, params, x) * 1e3
    r["grad_ms"] = timeit(grad, params, x) * 1e3
    r["bwd_only_ms"] = r["grad_ms"] - r["fwd_train_ms"]
    print(json.dumps(r, indent=1), flush=True)


if __name__ == "__main__":
    main()
