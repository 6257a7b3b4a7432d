"""In-model per-stage cost of lemevit_base @ bs256 via truncated depths.

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

BASE = dict(embed_dim=(96, 96, 192, 384, 512), head_dim=32,
            mlp_ratios=(4, 4, 4, 4, 4), attn_type=("C", "D", "D", "S", "S"),
            queries_len=16, num_classes=1000, dtype=jnp.bfloat16,
            attn_backend="auto")
FULL = (2, 4, 4, 18, 4)


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
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 224, 224, 3),
                          jnp.float32)
    prev = 0.0
    for cut in range(6):
        depth = tuple(FULL[i] if i < cut else 0 for i in range(5))
        m = LeMeViT(depth=depth, **BASE)
        v = jax.jit(m.init)(jax.random.PRNGKey(1), x[:1])
        f = jax.jit(lambda vv, xx, mm=m: mm.apply(vv, xx))
        dt = timeit(f, v, x) * 1e3
        label = "plumbing" if cut == 0 else f"+stage{cut - 1}"
        print(f"depth={depth}: {dt:7.2f} ms  ({label}: {dt - prev:+7.2f} ms)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
