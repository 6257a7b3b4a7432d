"""Serial TPU benchmark sweep. Run as the ONLY TPU client:
  nohup python -u scripts/tpu_bench.py > /tmp/tpu_sweep.log 2>&1 &
Writes JSON lines to /tmp/tpu_sweep_results.jsonl as results land.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = "/tmp/tpu_sweep_results.jsonl"


def emit(**kv):
    print(json.dumps(kv), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kv) + "\n")


def timeit(f, *a, n=30):
    r = f(*a)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    from lemevit_tpu.models import create_model

    rng = jax.random.PRNGKey(0)
    refs = {"lemevit_tiny": 5316.58, "lemevit_small": 3608.12,
            "lemevit_base": 1482.70}

    for name in ["lemevit_tiny", "lemevit_base"]:
        for backend in ["xla", "pallas"]:
            try:
                m = create_model(name, num_classes=1000, dtype=jnp.bfloat16,
                                 attn_backend=backend)
                x = jax.random.normal(rng, (256, 224, 224, 3), jnp.bfloat16)
                v = jax.jit(m.init)(rng, x[:1])
                f = jax.jit(lambda v, xx: m.apply(v, xx, train=False))
                t0 = time.time()
                dt = timeit(f, v, x)
                emit(model=name, backend=backend, ms=round(dt * 1000, 2),
                     ips=round(256 / dt, 1),
                     vs_ref=round(256 / dt / refs[name], 3),
                     compile_s=round(time.time() - t0 - 30 * dt, 1))
            except Exception as e:  # noqa: BLE001
                emit(model=name, backend=backend, error=str(e)[:300])

    # batch scaling on base/xla
    for bs in [512]:
        m = create_model("lemevit_base", num_classes=1000,
                         dtype=jnp.bfloat16, attn_backend="xla")
        x = jax.random.normal(rng, (bs, 224, 224, 3), jnp.bfloat16)
        v = jax.jit(m.init)(rng, x[:1])
        f = jax.jit(lambda v, xx: m.apply(v, xx, train=False))
        dt = timeit(f, v, x, n=15)
        emit(model="lemevit_base", backend="xla", batch=bs,
             ms=round(dt * 1000, 2), ips=round(bs / dt, 1),
             vs_ref=round(bs / dt / refs["lemevit_base"], 3))


if __name__ == "__main__":
    main()
