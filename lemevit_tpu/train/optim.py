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
    sched: str = "cosine",
    decay_epochs: float = 90,
    decay_rate: float = 0.1,
    decay_milestones=(),
    power: float = 1.0,
):
    """LR schedule factory: cosine (default), step, multistep, poly,
    constant — the timm create_scheduler_v2 surface the reference reaches
    through --sched (/root/reference/main.py:514-537). All schedules share
    the linear warmup from warmup_lr."""
    peak = scaled_lr(base_lr, global_batch_size, scaling=scaling)
    warmup_steps = max(int(warmup_epochs * steps_per_epoch), 1)
    total_steps = max(int(epochs * steps_per_epoch), warmup_steps + 1)
    if sched == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=warmup_lr, peak_value=peak,
            warmup_steps=warmup_steps, decay_steps=total_steps,
            end_value=min_lr)
    warmup = optax.linear_schedule(warmup_lr, peak, warmup_steps)
    # decay milestones are measured in epochs FROM TRAINING START (timm
    # convention); the joined main schedule starts counting after warmup,
    # so shift its boundaries left by warmup_steps
    if sched == "step":
        ms = [k * decay_epochs for k in
              range(1, int(epochs / max(decay_epochs, 1e-9)) + 1)]
        bounds = {max(int(m * steps_per_epoch) - warmup_steps, 1):
                  decay_rate for m in ms}
        main = optax.piecewise_constant_schedule(peak, bounds)
    elif sched == "multistep":
        bounds = {max(int(m * steps_per_epoch) - warmup_steps, 1):
                  decay_rate for m in decay_milestones}
        main = optax.piecewise_constant_schedule(peak, bounds)
    elif sched == "poly":
        main = optax.polynomial_schedule(
            init_value=peak, end_value=min_lr, power=power,
            transition_steps=total_steps - warmup_steps)
    elif sched in ("constant", "none"):
        main = optax.constant_schedule(peak)
    else:
        raise ValueError(f"unknown sched {sched!r}")
    return optax.join_schedules([warmup, main], [warmup_steps])


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
    opt: str = "adamw",
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Optimizer factory covering the timm create_optimizer_v2 names the
    reference reaches through --opt (/root/reference/main.py:258): adamw
    (default), adam, sgd/momentum/nesterov, rmsprop (tf-style), lamb,
    adagrad. Weight decay always skips 1D params and meta_tokens; for
    non-decoupled optimizers it is applied as masked add_decayed_weights
    before the update rule (timm's L2-into-grads placement)."""
    mask = (lambda p: _wd_mask(p)) if params_example is None else _wd_mask(
        params_example)
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    opt = opt.lower()
    if opt == "adamw":
        chain.append(optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=eps,
                                 weight_decay=weight_decay, mask=mask))
    elif opt == "lamb":
        chain.append(optax.lamb(learning_rate, b1=beta1, b2=beta2, eps=eps,
                                weight_decay=weight_decay, mask=mask))
    else:
        if weight_decay:
            chain.append(optax.masked(
                optax.add_decayed_weights(weight_decay), mask))
        if opt == "adam":
            chain.append(optax.adam(learning_rate, b1=beta1, b2=beta2,
                                    eps=eps))
        elif opt in ("sgd", "momentum", "nesterov"):
            chain.append(optax.sgd(
                learning_rate,
                momentum=momentum if opt != "sgd" or momentum else None,
                nesterov=opt == "nesterov"))
        elif opt in ("rmsprop", "rmsproptf"):
            chain.append(optax.rmsprop(learning_rate, decay=0.9, eps=eps,
                                       momentum=momentum, centered=False))
        elif opt == "adagrad":
            chain.append(optax.adagrad(learning_rate, eps=eps))
        else:
            raise ValueError(f"unknown opt {opt!r}")
    tx = optax.chain(*chain)
    if frozen_prefixes:
        fm = lambda p: _freeze_mask(p, tuple(frozen_prefixes))
        tx = optax.chain(
            tx, optax.masked(optax.set_to_zero(), fm))
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
