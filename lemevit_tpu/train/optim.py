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
    elif sched in ("constant", "none", "plateau"):
        # plateau: the schedule holds the peak; the metric-driven decay is
        # a multiplicative step_size hyperparam on the optimizer (see
        # PlateauController / set_plateau_scale), because LR-on-metric
        # cannot be a pure function of the step count
        main = optax.constant_schedule(peak)
    else:
        raise ValueError(f"unknown sched {sched!r}")
    return optax.join_schedules([warmup, main], [warmup_steps])


def mm_step_schedule(base_lr: float, steps_per_epoch: int,
                     milestones=(8, 11), gamma: float = 0.1,
                     warmup_iters: int = 500, warmup_ratio: float = 1e-3):
    """mmcv StepLrUpdater + linear warmup, the schedule of record for the
    detection verticals (reference object_detection/configs/obb/_base_/
    schedules/schedule_{1x,2x,3x}.py: step=[8,11]/[16,22]/[24,33],
    warmup_iters 500/500/200, warmup_ratio 1e-3/1e-3/5e-3). Warmup is in
    ITERATIONS with mmcv's ramp `1 - (1 - i/w)(1 - ratio)`; decay is per
    epoch milestone."""
    import jax.numpy as jnp
    ms = jnp.asarray([float(m) * steps_per_epoch for m in milestones])

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        ramp = 1.0 - (1.0 - s / max(warmup_iters, 1)) * (1.0 - warmup_ratio)
        warm = jnp.where(s < warmup_iters, ramp, 1.0)
        decay = gamma ** jnp.sum(s >= ms)
        return base_lr * warm * decay

    return sched


def warmup_poly_schedule(base_lr: float, total_steps: int,
                         power: float = 1.0, min_lr: float = 0.0,
                         warmup_iters: int = 1500,
                         warmup_ratio: float = 1e-6):
    """mmcv poly policy + linear warmup — the segmentation schedule of
    record (reference upernet_lemevit_512x512_80k_potsdam.py lr_config:
    poly power 1.0 min_lr 0, warmup linear 1500 iters ratio 1e-6).

    mmcv's PolyLrUpdaterHook computes progress as s/total (no warmup
    offset) and multiplies the warmup factor on top — e.g. at s=1500 the
    LR is 4e-4*(1-1500/80000), not 4e-4."""
    import jax.numpy as jnp

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        ramp = 1.0 - (1.0 - s / max(warmup_iters, 1)) * (1.0 - warmup_ratio)
        warm = jnp.where(s < warmup_iters, ramp, 1.0)
        frac = jnp.clip(s / max(total_steps, 1), 0.0, 1.0)
        poly = (base_lr - min_lr) * (1.0 - frac) ** power + min_lr
        return poly * warm

    return sched


class PlateauController:
    """Host-side ReduceLROnPlateau (the timm `--sched plateau` surface,
    /root/reference/main.py:514-537): feed the eval metric once per
    epoch; the LR scale decays by ``decay_rate`` after ``patience``
    epochs without improvement. Apply the returned scale with
    set_plateau_scale (requires build_optimizer(plateau=True))."""

    def __init__(self, decay_rate: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, mode: str = "max",
                 cooldown: int = 0, min_scale: float = 1e-3):
        self.decay_rate = decay_rate
        self.patience = patience
        self.threshold = threshold
        self.mode = mode
        self.cooldown = cooldown
        self.min_scale = min_scale
        self.best = None
        self.bad_epochs = 0
        self.cooldown_left = 0
        self.scale = 1.0

    def _improved(self, metric) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best + self.threshold
        return metric < self.best - self.threshold

    def update(self, metric) -> float:
        """Record one eval metric; returns the (possibly decayed) scale."""
        if self._improved(metric):
            self.best = metric
            self.bad_epochs = 0
        elif self.cooldown_left > 0:
            self.cooldown_left -= 1
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.decay_rate,
                                 self.min_scale)
                self.bad_epochs = 0
                self.cooldown_left = self.cooldown
        return self.scale


def set_plateau_scale(opt_state, scale):
    """Return opt_state with the plateau step_size hyperparam replaced
    (walks the optax state tree for the InjectHyperparamsState, through
    MultiSteps/chain wrappers)."""
    def walk(s):
        # optax >= 0.2 returns InjectStatefulHyperparamsState; match both
        if isinstance(s, tuple) and hasattr(s, "hyperparams") \
                and "step_size" in getattr(s, "hyperparams", {}):
            hp = dict(s.hyperparams)
            hp["step_size"] = jnp.asarray(
                scale, jnp.asarray(hp["step_size"]).dtype)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple
            return type(s)(*(walk(v) for v in s))
        if isinstance(s, (tuple, list)):
            return type(s)(walk(v) for v in s)
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return s

    return walk(opt_state)


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
    plateau: bool = False,
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
            # timm's create_optimizer_v2 treats 'sgd' as NESTEROV momentum
            # SGD ('momentum' is plain heavy-ball) — match those dynamics
            chain.append(optax.sgd(
                learning_rate, momentum=momentum or None,
                nesterov=opt in ("sgd", "nesterov")))
        elif opt in ("rmsprop", "rmsproptf"):
            chain.append(optax.rmsprop(learning_rate, decay=0.9, eps=eps,
                                       momentum=momentum, centered=False))
        elif opt == "adagrad":
            chain.append(optax.adagrad(learning_rate, eps=eps))
        else:
            raise ValueError(f"unknown opt {opt!r}")
    if plateau:
        # metric-driven LR decay rides a mutable step_size hyperparam
        # (PlateauController.update -> set_plateau_scale on the opt state)
        chain.append(optax.inject_hyperparams(optax.scale)(step_size=1.0))
    tx = optax.chain(*chain)
    if frozen_prefixes:
        fm = lambda p: _freeze_mask(p, tuple(frozen_prefixes))
        tx = optax.chain(
            tx, optax.masked(optax.set_to_zero(), fm))
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
