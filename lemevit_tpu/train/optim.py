"""Optimizer + LR schedule factory (optax), matching the reference recipe.

Hyperparameters of record (configs/lemevit.yaml in the reference):
AdamW betas (0.9, 0.999), eps 1e-8, weight decay 0.05; cosine schedule with
5-epoch linear warmup from 1e-6; base LR 5e-4 per 512 global batch, scaled
linearly (or sqrt) with the actual global batch (/root/reference/main.py:244-267).
Weight decay skips 1D params (norm scales/biases) and meta_tokens, the timm
convention the reference inherits.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def scaled_lr(base_lr: float, global_batch_size: int,
              base_batch: int = 512, scaling: str = "linear") -> float:
    if scaling == "none":
        return base_lr
    ratio = global_batch_size / base_batch
    if scaling == "sqrt":
        ratio = ratio ** 0.5
    return base_lr * ratio


def build_lr_schedule(
    base_lr: float = 5e-4,
    global_batch_size: int = 512,
    steps_per_epoch: int = 1000,
    epochs: int = 280,
    warmup_epochs: int = 5,
    warmup_lr: float = 1e-6,
    min_lr: float = 1e-5,
    scaling: str = "linear",
):
    peak = scaled_lr(base_lr, global_batch_size, scaling=scaling)
    warmup_steps = int(warmup_epochs * steps_per_epoch)
    total_steps = int(epochs * steps_per_epoch)
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_lr,
        peak_value=peak,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=min_lr,
    )


def _wd_mask(params):
    """True where weight decay applies: >=2D kernels, excluding meta_tokens."""
    def mask_leaf(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if "meta_tokens" in names:
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def _freeze_mask(params, prefixes):
    """True (=zero the update) where the param path starts with any of the
    given '/'-joined prefixes — the functional equivalent of the reference's
    frozen_stages / requires_grad_(False)."""
    def leaf(path, _):
        names = "/".join(getattr(k, "key", str(k)) for k in path)
        return any(names.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(leaf, params)


def build_optimizer(
    learning_rate,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    grad_accum_steps: int = 1,
    frozen_prefixes=(),
    params_example=None,
) -> optax.GradientTransformation:
    mask = (lambda p: _wd_mask(p)) if params_example is None else _wd_mask(
        params_example)
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=eps,
                             weight_decay=weight_decay, mask=mask))
    tx = optax.chain(*chain)
    if frozen_prefixes:
        fm = lambda p: _freeze_mask(p, tuple(frozen_prefixes))
        tx = optax.chain(
            tx, optax.masked(optax.set_to_zero(), fm))
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
