"""Detection / segmentation losses.

TPU-native equivalents of the reference native ops and CD losses:
  - sigmoid_focal_loss: the fused CUDA op
    (object_detection/mmdet/ops/sigmoid_focal_loss, 271 LoC C++/CUDA) is a
    few fused elementwise lines in XLA — expressed directly, grad for free.
  - focal/dice/jaccard/tversky/hybrid: change_detection/utils/metrics.py:9-170
    and losses.py:7-20 semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       gamma: float = 2.0, alpha: float = 0.25,
                       reduction: str = "mean") -> jax.Array:
    """Focal loss on multi-class one-vs-all logits.

    logits: (N, C); targets: int (N,) class indices in [0, C] where class 0
    in mmdet convention means background when C classes are foreground —
    here targets index columns directly; rows with target == -1 are ignored.
    """
    n, c = logits.shape
    t = jax.nn.one_hot(targets, c, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, t)
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    valid = (targets >= 0)[:, None]
    loss = jnp.where(valid, loss, 0.0)
    return _reduce(loss, reduction)


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def softmax_focal_loss(logits: jax.Array, targets: jax.Array,
                       gamma: float = 0.0,
                       reduction: str = "mean") -> jax.Array:
    """CD FocalLoss (gamma=0 => plain CE), logits (N, C, ...) or (N, C)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    t = jax.nn.one_hot(targets, logits.shape[1], axis=1, dtype=logits.dtype)
    logpt = jnp.sum(logp * t, axis=1)
    pt = jnp.exp(logpt)
    loss = -((1 - pt) ** gamma) * logpt
    return _reduce(loss, reduction)


def dice_loss(logits: jax.Array, targets: jax.Array,
              smooth: float = 1.0, eps: float = 1e-7) -> jax.Array:
    """Soft dice over softmax probs; logits (N,C,H,W), targets int (N,H,W)."""
    num_classes = logits.shape[1]
    probs = jax.nn.softmax(logits, axis=1)
    t = jax.nn.one_hot(targets, num_classes, axis=1, dtype=logits.dtype)
    dims = (0,) + tuple(range(2, logits.ndim))
    inter = jnp.sum(probs * t, axis=dims)
    card = jnp.sum(probs + t, axis=dims)
    dice = ((2 * inter + smooth) / (card + smooth + eps)).mean()
    return 1.0 - dice


def jaccard_loss(logits: jax.Array, targets: jax.Array,
                 smooth: float = 1.0, eps: float = 1e-7) -> jax.Array:
    num_classes = logits.shape[1]
    probs = jax.nn.softmax(logits, axis=1)
    t = jax.nn.one_hot(targets, num_classes, axis=1, dtype=logits.dtype)
    dims = (0,) + tuple(range(2, logits.ndim))
    inter = jnp.sum(probs * t, axis=dims)
    union = jnp.sum(probs + t, axis=dims) - inter
    jac = ((inter + smooth) / (union + smooth + eps)).mean()
    return 1.0 - jac


def tversky_loss(logits: jax.Array, targets: jax.Array,
                 alpha: float = 0.5, beta: float = 0.5,
                 smooth: float = 1.0, eps: float = 1e-7) -> jax.Array:
    num_classes = logits.shape[1]
    probs = jax.nn.softmax(logits, axis=1)
    t = jax.nn.one_hot(targets, num_classes, axis=1, dtype=logits.dtype)
    dims = (0,) + tuple(range(2, logits.ndim))
    tp = jnp.sum(probs * t, axis=dims)
    fp = jnp.sum(probs * (1 - t), axis=dims)
    fn = jnp.sum((1 - probs) * t, axis=dims)
    tv = ((tp + smooth) / (tp + alpha * fp + beta * fn + smooth + eps)).mean()
    return 1.0 - tv


def hybrid_loss(outputs: Union[jax.Array, Sequence[jax.Array]],
                targets: jax.Array, focal_gamma: float = 0.0) -> jax.Array:
    """CD hybrid: sum of (focal + dice) over (possibly multiple) outputs."""
    if not isinstance(outputs, (list, tuple)):
        outputs = [outputs]
    loss = 0.0
    for out in outputs:
        loss = loss + softmax_focal_loss(out, targets, gamma=focal_gamma)
        loss = loss + dice_loss(out, targets)
    return loss


def _reduce(loss, reduction):
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss
