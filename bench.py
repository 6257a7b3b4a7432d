"""Headline benchmark: LeMeViT inference images/sec on one chip, per variant.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "variants"}.
The headline metric/value/vs_baseline stay LeMeViT-Base (the north-star gate,
BASELINE.json: >=2x per TPU v5e chip); "variants" carries tiny/small/base so
BENCH_rN tracks all three classification variants (VERDICT r3 item 2).
Baselines = the reference's published A100-class numbers at bs 256, 224^2,
AMP (/root/reference/README.md:85-87).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# /root/reference/README.md:85-87 (benchmark.py --bench both --batch-size 256
# --img-size 224 --amp --channels-last)
REF_IMGS_PER_SEC = {
    "lemevit_tiny": 5316.58,
    "lemevit_small": 3608.12,
    "lemevit_base": 1482.70,
}


def bench_variant(name: str, on_tpu: bool) -> float:
    from lemevit_tpu.models import create_model

    batch = 256 if on_tpu else 8
    model = create_model(
        name, num_classes=1000,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x[:1])

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)

    # warmup + compile; force materialization with a scalar readback —
    # block_until_ready alone is not trustworthy on the axon tunnel platform
    float(forward(variables, x).sum())
    float(forward(variables, x).sum())

    # median of repeats: single-window timing had ~1.5% run-to-run spread,
    # enough to straddle the 2x gate (BENCH_r04 1.985x vs judge rerun
    # 2.015x on identical code) — VERDICT r4 item 6
    n_iter = 30 if on_tpu else 3
    reps = []
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = forward(variables, x)
        float(out.sum())
        reps.append(time.perf_counter() - t0)
    dt = sorted(reps)[len(reps) // 2]
    return batch * n_iter / dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    variants = {}
    for name, ref in REF_IMGS_PER_SEC.items():
        ips = bench_variant(name, on_tpu)
        variants[name] = {
            "value": round(ips, 2),
            "vs_baseline": round(ips / ref, 3),
        }

    base = variants["lemevit_base"]
    print(json.dumps({
        "metric": "lemevit_base_224_inference",
        "value": base["value"],
        "unit": "images/sec/chip",
        "vs_baseline": base["vs_baseline"],
        "variants": variants,
    }))


if __name__ == "__main__":
    main()
