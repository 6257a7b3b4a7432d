"""Device-aug cost breakdown on chip (run as the ONLY TPU client).

E2EBENCH r4 measured the full device aug at ~2.5 s per 256-batch — far
too hot. This ablates the pipeline stage by stage (RRC, flip, each RA op
family) to find where the time goes; suspects are the sort-based
equalize (768 x 50k sorts) and the bilinear warp's 2D gathers.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lemevit_tpu.data import device_aug as da  # noqa: E402

B, S, OUT = 256, 256, 224


def timeit(f, *a, reps=6):
    float(jax.tree.leaves(f(*a))[0].sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    float(jax.tree.leaves(r)[0].sum())
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    x = jnp.zeros((B, S, S, 3), jnp.uint8)
    xf = jnp.zeros((B, OUT, OUT, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    # full pipelines
    for name, aa in [("rrc_only", None),
                     ("rrc_flip_ra", "rand-m9-mstd0.5-inc1")]:
        f = jax.jit(da.make_train_aug(OUT, hflip=0.5, auto_augment=aa))
        print(f"{name:24s} {timeit(f, key, x):8.1f} ms", flush=True)

    # individual pieces on (B, 224, 224, 3) float images
    def vm(op):
        return jax.jit(jax.vmap(lambda im: op(im)))

    pieces = {
        "equalize": lambda im: da._equalize(im, 9.0, 0.3),
        "autocontrast": lambda im: da._autocontrast(im, 9.0, 0.3),
        "sharpness": lambda im: da._sharpness(im, 9.0, 0.3),
        "solarize": lambda im: da._solarize(im, 9.0, 0.3),
        "warp_rot20": lambda im: da._affine_warp(
            im, da._geo_matrix(jnp.int32(0), jnp.float32(6.0),
                               jnp.float32(0.0), OUT, OUT)),
    }
    for name, op in pieces.items():
        try:
            print(f"{name:24s} {timeit(vm(op), xf):8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} ERROR {type(e).__name__}: {e}", flush=True)

    # one batched RA layer (stratified slices; the r5 design)
    ra1 = jax.jit(lambda k, im: da._ra_layer_batch(k, im, 9.0, 0.5))
    print(f"{'ra_layer_batch':24s} {timeit(ra1, key, xf):8.1f} ms",
          flush=True)

    # RRC resample alone (scale_and_translate cubic)
    rrc = jax.jit(jax.vmap(functools.partial(
        da._rrc_one, out_px=OUT, scale=(0.08, 1.0),
        ratio=(3 / 4, 4 / 3), method="cubic")))
    keys = jax.random.split(key, B)
    print(f"{'rrc_resample':24s} "
          f"{timeit(lambda: rrc(keys, x.astype(jnp.float32))):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
