"""Micro-probe of in-kernel VPU op costs on TPU (run as the only client).

Times a pallas kernel that loads a (R, C) bf16 tile, applies OP k times,
and stores it back. The slope over k isolates the per-pass cost of OP at
that tile shape, independent of launch/DMA overhead.

  python -u scripts/vpu_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lemevit_tpu.attn import pallas_block as pb


def _gelu_tanh(x):
    t = jnp.clip(x * 0.7071067811865476, -6.0, 6.0)
    u = t * t
    a = t * (1.12812423 + u * (0.10414107 + u * -0.00181363))
    return 0.5 * x * (1.0 + jnp.tanh(a))


OPS = {
    "exp": lambda t: jnp.exp(t),
    "exp2": lambda t: jnp.exp2(t),
    "recip": lambda t: 1.0 / (t + 1.001),
    "gelu_fast": lambda t: pb._gelu(t, fast=True),
    "gelu_full": lambda t: pb._gelu(t, fast=False),
    "ln": lambda t: pb._ln(t, jnp.ones((t.shape[-1],), jnp.float32),
                           jnp.zeros((t.shape[-1],), jnp.float32)),
    "rowmax": lambda t: t - jnp.max(t, axis=1, keepdims=True),
    "rowsum": lambda t: t / jnp.sum(t, axis=1, keepdims=True),
    "fma": lambda t: t * 1.0001 + 0.001,
    "cast_rt": lambda t: t.astype(jnp.bfloat16).astype(jnp.float32),
    "tanh": lambda t: jnp.tanh(t),
    "gelu_tanh": lambda t: _gelu_tanh(t),
}


def build(op, k, r, c, grid):
    def kern(x_ref, o_ref):
        t = x_ref[:].astype(jnp.float32)
        for _ in range(k):
            t = OPS[op](t)
        o_ref[:] = t.astype(x_ref.dtype)

    spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(grid,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r * grid, c), jnp.bfloat16))


def timeit(f, x, reps=30):
    def fence(res):
        return float(res[0, 0])
    fence(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x)
    fence(r)
    return (time.perf_counter() - t0) / reps


def main():
    grid = 64
    for (r, c) in [(392, 1536), (784, 384), (1568, 784)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (r * grid, c),
                              jnp.bfloat16)
        base = timeit(jax.jit(build("fma", 0, r, c, grid)), x)
        line = [f"({r:5d},{c:5d}) base={base*1e3:6.3f}ms"]
        for op in OPS:
            k = 4 if op.startswith("gelu") or op == "ln" else 8
            dt = timeit(jax.jit(build(op, k, r, c, grid)), x)
            per = (dt - base) / k / grid * 1e6
            line.append(f"{op}={per:6.2f}us")
        print(" ".join(line), flush=True)


if __name__ == "__main__":
    main()
