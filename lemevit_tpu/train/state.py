"""Train state: params + batch_stats + optimizer + EMA in one pytree.

Functional replacement for the reference's DDP model + timm ModelEmaV2 +
NativeScaler bundle (/root/reference/main.py:258-340). No loss scaling —
bf16 on TPU doesn't need it.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)
    apply_fn: Any = struct.field(pytree_node=False, default=None)
    tx: Any = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + (1.0 - d) * p, new_ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    @property
    def ema_variables(self):
        return {"params": self.ema_params, "batch_stats": self.batch_stats}


def create_train_state(model, rng, input_shape, tx,
                       ema_decay: float = 0.0) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay > 0 else None,
        ema_decay=ema_decay,
        apply_fn=model.apply,
        tx=tx,
    )
