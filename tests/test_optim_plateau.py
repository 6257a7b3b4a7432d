"""Plateau LR schedule: controller logic + the injected step_size path
(the timm `--sched plateau` surface, reference main.py:514-537)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lemevit_tpu.train.optim import (PlateauController, build_optimizer,
                                     set_plateau_scale)

pytestmark = pytest.mark.fast


def test_controller_decays_after_patience():
    c = PlateauController(decay_rate=0.5, patience=2, mode="max")
    assert c.update(10.0) == 1.0          # first metric = best
    assert c.update(10.0) == 1.0          # bad 1 (no improvement)
    assert c.update(10.0) == 1.0          # bad 2
    assert c.update(10.0) == 0.5          # bad 3 > patience -> decay
    assert c.update(11.0) == 0.5          # improvement resets counter
    assert c.bad_epochs == 0


def test_controller_min_mode():
    c = PlateauController(decay_rate=0.1, patience=0, mode="min")
    assert c.update(1.0) == 1.0
    assert c.update(0.5) == 1.0           # improved (lower loss)
    assert c.update(0.6) == pytest.approx(0.1)  # worse -> immediate decay


def test_injected_scale_shrinks_updates():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    tx = build_optimizer(1e-2, weight_decay=0.0, opt="sgd", momentum=0.0,
                         plateau=True)
    st = tx.init(params)
    up1, st1 = tx.update(grads, st, params)
    st_scaled = set_plateau_scale(st, 0.1)
    up2, _ = tx.update(grads, st_scaled, params)
    r = float(jnp.abs(up2["w"]).max() / jnp.abs(up1["w"]).max())
    assert np.isclose(r, 0.1, rtol=1e-5)


def test_scale_surgery_through_multisteps():
    params = {"w": jnp.ones((2, 2))}
    tx = build_optimizer(1e-2, weight_decay=0.0, grad_accum_steps=2,
                         plateau=True)
    st = tx.init(params)
    st2 = set_plateau_scale(st, 0.25)
    # the hyperparam must have changed somewhere in the wrapped state
    leaves = [float(x) for x in jax.tree.leaves(st2)
              if getattr(x, "shape", None) == () and
              float(jnp.asarray(x)) == 0.25]
    assert leaves, "step_size hyperparam not updated through MultiSteps"
