"""Headline benchmark: LeMeViT-Base 224^2 inference images/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's published A100-class number for Base at bs 256,
224^2, AMP (1482.70 img/s, /root/reference/README.md:87); north star is
>=2x per TPU v5e chip (BASELINE.json).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_BASE_IMGS_PER_SEC = 1482.70


def main():
    from lemevit_tpu.models import create_model

    on_tpu = jax.default_backend() == "tpu"
    batch = 256 if on_tpu else 8
    model = create_model(
        "lemevit_base", num_classes=1000,
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

    n_iter = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = forward(variables, x)
    float(out.sum())
    dt = time.perf_counter() - t0
    ips = batch * n_iter / dt

    print(json.dumps({
        "metric": "lemevit_base_224_inference",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_BASE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
