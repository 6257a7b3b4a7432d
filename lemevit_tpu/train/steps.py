"""jit-able train / eval steps.

The TPU-native replacement for the reference hot loop
(/root/reference/engine.py:12-174): one pjit-compiled function per step,
donated state, bf16 compute inside the model, fp32 loss. Gradient all-reduce
over the "data" mesh axis is implicit in the sharding annotations — no NCCL
bucketing, no GradScaler (bf16 needs no loss scaling).

Targets may be int labels or soft distributions (mixup/cutmix output);
label smoothing folds into the soft-target cross-entropy exactly like
timm's SoftTargetCrossEntropy / LabelSmoothingCrossEntropy pair.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lemevit_tpu.train.state import TrainState


def cross_entropy_loss(logits: jax.Array, targets: jax.Array,
                       label_smoothing: float = 0.0) -> jax.Array:
    """CE over int labels or soft-target rows, with label smoothing."""
    num_classes = logits.shape[-1]
    if targets.ndim == logits.ndim - 1:
        targets = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    if label_smoothing > 0.0:
        targets = (targets * (1.0 - label_smoothing)
                   + label_smoothing / num_classes)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(targets * logp, axis=-1).mean()


def make_train_step(label_smoothing: float = 0.1,
                    has_batch_stats: bool = True) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(
                variables, batch["image"], train=True,
                rngs={"dropout": step_rng}, mutable=mutable)
            logits, mutated = out if mutable else (out, {})
            loss = cross_entropy_loss(logits, batch["label"], label_smoothing)
            return loss, (logits, mutated.get("batch_stats", {}))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, new_stats if has_batch_stats else state.batch_stats)
        gnorm = optax_global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return new_state, metrics

    return train_step


def jsd_cross_entropy(logits_s: jax.Array, targets: jax.Array,
                      alpha: float = 12.0) -> jax.Array:
    """JSD consistency loss over aug splits (timm JsdCrossEntropy,
    reference main.py:451-471 --jsd-loss path): CE on the CLEAN split 0
    plus alpha * mean_splits KL(p_i || mean_j p_j).

    logits_s: (S, B, K); targets: (B, K) soft rows (smoothing pre-folded).
    """
    logits32 = logits_s.astype(jnp.float32)
    logp0 = jax.nn.log_softmax(logits32[0], axis=-1)
    ce = -jnp.sum(targets * logp0, axis=-1).mean()
    probs = jax.nn.softmax(logits32, axis=-1)                  # (S, B, K)
    mix = jnp.clip(probs.mean(axis=0), 1e-7, 1.0)
    kl = jnp.sum(probs * (jnp.log(jnp.clip(probs, 1e-7, 1.0))
                          - jnp.log(mix)[None]), axis=-1)      # (S, B)
    return ce + alpha * kl.mean()


def make_jsd_train_step(num_splits: int, jsd_alpha: float = 12.0) -> Callable:
    """Aug-splits train step with split-BN: images (S, B, H, W, C); the
    state's batch_stats carry a leading (S,) axis (one BatchNorm statistics
    set per split — timm convert_splitbn_model semantics) and the model is
    vmapped over splits with shared params. Targets are (B, K) soft rows."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            def apply_one(bs, im, r):
                out, mut = state.apply_fn(
                    {"params": params, "batch_stats": bs}, im, train=True,
                    rngs={"dropout": r}, mutable=["batch_stats"])
                return out, mut["batch_stats"]

            rngs = jax.random.split(step_rng, num_splits)
            logits_s, new_stats = jax.vmap(apply_one)(
                state.batch_stats, batch["image"], rngs)
            loss = jsd_cross_entropy(logits_s, batch["label"], jsd_alpha)
            return loss, (logits_s, new_stats)

        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss": loss, "grad_norm": optax_global_norm(grads)}
        return new_state, metrics

    return train_step


def stack_batch_stats(batch_stats, num_splits: int):
    """Broadcast a batch_stats pytree to a leading (S,) axis for split-BN."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_splits,) + x.shape).copy(),
        batch_stats)


def unstack_batch_stats(batch_stats):
    """Clean-split (index 0) statistics — the set eval uses."""
    return jax.tree.map(lambda x: x[0], batch_stats)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def make_eval_step(use_ema: bool = False) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
        variables = state.ema_variables if use_ema else state.variables
        logits = state.apply_fn(variables, batch["image"], train=False)
        return eval_metrics(logits, batch["label"])

    return eval_step


def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
    return make_eval_step(False)(state, batch)


def eval_metrics(logits: jax.Array, labels: jax.Array) -> Dict[str, jax.Array]:
    """Per-batch sums (not means) so callers can aggregate exactly."""
    loss = cross_entropy_loss(logits, labels) * labels.shape[0]
    top5 = jax.lax.top_k(logits, 5)[1]
    correct1 = (top5[:, 0] == labels).sum()
    correct5 = (top5 == labels[:, None]).any(axis=-1).sum()
    return {
        "loss_sum": loss,
        "top1_sum": correct1,
        "top5_sum": correct5,
        "count": jnp.asarray(labels.shape[0], jnp.int32),
    }
