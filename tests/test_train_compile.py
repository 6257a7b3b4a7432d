"""On-TPU compile gate for the fused training kernels.

Round-2 shipped training kernels that passed CPU interpret-mode parity
but compile-crashed on the real chip (scoped-VMEM OOM at base stage3).
"Compiles on the target" must be a tested invariant: when a TPU is
visible, this test AOT-compiles the full value_and_grad of every
flagship model at the benchmarked batch size — non-interpreted, the
exact graph cli/train.py runs. On CPU it is skipped (the CPU lowering
of pallas_call does not enforce the 16 MB scoped-VMEM limit, which is
the failure mode under test).

Run explicitly on hardware:  python -m pytest tests/test_train_compile.py
(conftest pins tests to CPU, so this module re-selects the TPU backend
for its own lowering.)
"""
import jax
import jax.numpy as jnp
import pytest

from lemevit_tpu.models import create_model


def _tpu_devices():
    try:
        return jax.devices("tpu")
    except RuntimeError:
        return []


pytestmark = pytest.mark.skipif(
    not _tpu_devices(), reason="no TPU visible; scoped-VMEM limits are "
                               "only enforced by the TPU compiler")


@pytest.mark.parametrize("name", ["lemevit_tiny", "lemevit_small",
                                  "lemevit_base", "lemevit_tiny_v2"])
def test_train_step_compiles_on_tpu(name):
    dev = _tpu_devices()[0]
    model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((256, 224, 224, 3), jnp.float32)
    labels = jnp.zeros((256,), jnp.int32)
    variables = jax.eval_shape(model.init, rng, x[:1])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                          variables["params"])
    stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         variables.get("batch_stats", {}))

    def loss(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, xx, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], 1).mean()

    # AOT compile only (no execution): the round-2 failure was at compile
    grad = jax.jit(jax.grad(loss), device=dev)
    grad.lower(params, x).compile()
