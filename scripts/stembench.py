"""Stem formulation microbench: baseline 3x3-s2 conv stem vs
space-to-depth variants (ROADMAP idea: the first conv contracts only
kh*kw*Cin = 27 elements, badly under-filling the MXU's 128-wide
contraction; folding 2x2 pixel blocks into channels raises it to 48,
and 4x4 to 4x4x48=768 for conv2's view).

Compares, at bs 256 / 224^2 / bf16 eval mode:
  a) baseline: conv3x3 s2 (3->F/2) +BN+GELU, conv3x3 s2 (F/2->F) +BN
  b) s2d-2:    space-to-depth 2x2 -> conv2x2 s1 (12->F/2) pad(1,0),
               then same second conv
  c) s2d-both: both convs in s2d form (second conv s2d over F/2 chans
               is pointless for contraction but tests layout effects)

All variants are numerics-identical to (a) (weights remapped); the
script asserts allclose on CPU-to-TPU parity inputs first, then times.

  python -u scripts/stembench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, *a, reps=50):
    def fence(r):
        leaf = jax.tree.leaves(r)[0]
        return float(leaf.reshape(-1)[0])
    fence(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    fence(r)
    return (time.perf_counter() - t0) / reps * 1000.0


def bn_gelu(y, scale, bias, gelu=True):
    y = y * scale + bias
    if gelu:
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False)
    return y.astype(jnp.bfloat16)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (oi, oj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def w_s2d(w):
    """3x3 stride-2 HWIO weights -> 2x2 stride-1 weights over the s2d
    tensor with padding (1,0): W2[k, l, (oi, oj, c), f] =
    W[2k+oi-2, 2l+oj-2, c, f] where valid, else 0."""
    kh, kw, cin, f = w.shape
    assert kh == 3 and kw == 3
    w2 = np.zeros((2, 2, 2, 2, cin, f), np.float32)
    for k in range(2):
        for oi in range(2):
            r = 2 * k + oi - 2  # tap row relative to output*2
            if not 0 <= r + 1 < 3:
                continue
            for l in range(2):
                for oj in range(2):
                    s = 2 * l + oj - 2
                    if not 0 <= s + 1 < 3:
                        continue
                    w2[k, oi, l, oj] = w[r + 1, s + 1]
    # tensor layout: kernel position (k,l), channel (oi,oj,c)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, f)
    return jnp.asarray(w2)


def main():
    on_tpu = jax.default_backend() == "tpu"
    B = 256 if on_tpu else 4
    F = 96  # base
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, 224, 224, 3), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, 3, F // 2), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[2], (3, 3, F // 2, F), jnp.float32) * 0.05
    s1 = jax.random.normal(ks[3], (F // 2,), jnp.float32) * 0.1 + 1
    b1 = jax.random.normal(ks[4], (F // 2,), jnp.float32) * 0.1
    s2 = jnp.ones((F,), jnp.float32)
    b2 = jnp.zeros((F,), jnp.float32)
    w1q = w_s2d(np.asarray(w1))
    w2q = w_s2d(np.asarray(w2))

    @jax.jit
    def base(x):
        xb = x.astype(jnp.bfloat16)
        y = bn_gelu(conv(xb, w1.astype(jnp.bfloat16), 2, ((1, 1), (1, 1))),
                    s1, b1)
        y = bn_gelu(conv(y, w2.astype(jnp.bfloat16), 2, ((1, 1), (1, 1))),
                    s2, b2, gelu=False)
        return y

    @jax.jit
    def v_s2d2(x):
        xb = s2d(x.astype(jnp.bfloat16))
        y = bn_gelu(conv(xb, w1q.astype(jnp.bfloat16), 1, ((1, 0), (1, 0))),
                    s1, b1)
        y = bn_gelu(conv(y, w2.astype(jnp.bfloat16), 2, ((1, 1), (1, 1))),
                    s2, b2, gelu=False)
        return y

    @jax.jit
    def v_s2d_both(x):
        xb = s2d(x.astype(jnp.bfloat16))
        y = bn_gelu(conv(xb, w1q.astype(jnp.bfloat16), 1, ((1, 0), (1, 0))),
                    s1, b1)
        y = bn_gelu(conv(s2d(y), w2q.astype(jnp.bfloat16), 1,
                         ((1, 0), (1, 0))),
                    s2, b2, gelu=False)
        return y

    # parity
    ra = np.asarray(base(x), np.float32)
    for name, f in (("s2d2", v_s2d2), ("s2d_both", v_s2d_both)):
        rb = np.asarray(f(x), np.float32)
        err = np.abs(ra - rb).max()
        print(f"{name}: max |err| = {err:.3e}")
        assert err < 0.15, name  # bf16 conv reassociation tolerance

    if not on_tpu:
        print("CPU parity OK (no timing off-TPU)")
        return
    for name, f in (("base", base), ("s2d2", v_s2d2),
                    ("s2d_both", v_s2d_both)):
        print(f"{name}: {timeit(f, x):.3f} ms")


if __name__ == "__main__":
    main()
