"""In-model per-stage cost of a LeMeViT variant @ bs256 via truncated depths.

Times jitted inference forwards with depth cut after each stage; the
difference between consecutive cuts isolates that stage's block cost as
XLA actually schedules it (kbench times kernels standalone, which adds
per-call dispatch overhead through the axon tunnel). The depth-(0,..)
config measures stem + downsamples + meta-token plumbing + head.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lemevit_tpu.models.lemevit import LeMeViT  # noqa: E402

from lemevit_tpu.models.registry import _VARIANT_CFGS  # noqa: E402


def timeit(f, *a, reps=30):
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="lemevit_base")
    ap.add_argument("--batch-size", type=int, default=256)
    args = ap.parse_args()
    cfg = dict(_VARIANT_CFGS[args.model])
    full = cfg.pop("depth")
    cfg.update(num_classes=1000, dtype=jnp.bfloat16, attn_backend="auto")
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch_size, 224, 224, 3), jnp.float32)
    prev = 0.0
    for cut in range(len(full) + 1):
        depth = tuple(full[i] if i < cut else 0
                      for i in range(len(full)))
        m = LeMeViT(depth=depth, **cfg)
        v = jax.jit(m.init)(jax.random.PRNGKey(1), x[:1])
        f = jax.jit(lambda vv, xx, mm=m: mm.apply(vv, xx))
        dt = timeit(f, v, x) * 1e3
        label = "plumbing" if cut == 0 else f"+stage{cut - 1}"
        print(f"depth={depth}: {dt:7.2f} ms  ({label}: {dt - prev:+7.2f} ms)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
