"""Device-side batch augmentation: normalize + mixup/cutmix + random erasing.

These run *inside* the jitted train step on uint8 NHWC batches, so the host
never produces float pixels and XLA fuses normalization into the stem conv —
the TPU answer to the reference's CUDA PrefetchLoader + timm Mixup
(/root/reference/main.py:369-393,399-428).

Semantics follow timm's batch-mode Mixup (mixup_alpha 0.8 / cutmix_alpha 1.0,
switch 0.5) and RandomErasing (pixel mode, prob 0.25).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lemevit_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def normalize(images_u8: jax.Array,
              mean=IMAGENET_MEAN, std=IMAGENET_STD,
              dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> normalized float NHWC."""
    x = images_u8.astype(dtype) / 255.0
    mean = jnp.asarray(mean, dtype)
    std = jnp.asarray(std, dtype)
    return (x - mean) / std


def _rand_beta(rng, alpha: float) -> jax.Array:
    return jax.random.beta(rng, alpha, alpha)


def mixup_cutmix(
    rng: jax.Array,
    images: jax.Array,           # float NHWC (already normalized)
    labels: jax.Array,           # int (B,)
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-mode mixup/cutmix: mixes each sample with its batch-flip.
    Returns (mixed images, soft targets)."""
    b, h, w, _ = images.shape
    r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)

    use_aug = jax.random.uniform(r_apply) < prob
    use_cutmix = jnp.logical_and(
        use_aug, jax.random.uniform(r_switch) < switch_prob)
    use_mixup = jnp.logical_and(use_aug, jnp.logical_not(use_cutmix))

    flipped = images[::-1]
    lam_m = jnp.where(use_mixup, _rand_beta(r_lam_m, mixup_alpha), 1.0)
    lam_c = jnp.where(use_cutmix, _rand_beta(r_lam_c, cutmix_alpha), 1.0)

    # --- cutmix box (always computed; masked by lam_c==1 when inactive)
    cut_ratio = jnp.sqrt(1.0 - lam_c)
    cut_h = (cut_ratio * h).astype(jnp.int32)
    cut_w = (cut_ratio * w).astype(jnp.int32)
    cy = jax.random.randint(r_box, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(r_box, 1), (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    # correct lam by the realized box area (timm's correct_lam)
    lam_c_real = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

    cutmixed = jnp.where(in_box, flipped, images)
    mixed = lam_m * images + (1.0 - lam_m) * flipped
    out = jnp.where(use_cutmix, cutmixed, jnp.where(use_mixup, mixed, images))

    lam = jnp.where(use_cutmix, lam_c_real, lam_m)
    y1h = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    y2h = y1h[::-1]
    targets = lam * y1h + (1.0 - lam) * y2h
    if label_smoothing > 0:
        targets = (targets * (1.0 - label_smoothing)
                   + label_smoothing / num_classes)
    return out, targets


def random_erasing(
    rng: jax.Array,
    images: jax.Array,           # float NHWC (normalized)
    prob: float = 0.25,
    scale: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> jax.Array:
    """Per-image erasure with gaussian noise ('pixel' mode)."""
    b, h, w, c = images.shape
    rngs = jax.random.split(rng, 5)
    apply = jax.random.uniform(rngs[0], (b,)) < prob
    area = jax.random.uniform(rngs[1], (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(rngs[2], (b,),
                               minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * h * w * aspect), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area * h * w / aspect), 1, w).astype(jnp.int32)
    y0 = (jax.random.uniform(rngs[3], (b,))
          * (h - eh).astype(jnp.float32)).astype(jnp.int32)
    x0 = (jax.random.uniform(jax.random.fold_in(rngs[3], 1), (b,))
          * (w - ew).astype(jnp.float32)).astype(jnp.int32)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    mask = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
            & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    mask = (mask & apply[:, None, None])[..., None]
    noise = jax.random.normal(rngs[4], images.shape, images.dtype)
    return jnp.where(mask, noise, images)
