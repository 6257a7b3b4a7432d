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
import os

import jax
import jax.numpy as jnp
import pytest


def _tpu_devices():
    try:
        return jax.devices("tpu")
    except RuntimeError:
        # conftest pins pytest's own backend to CPU, which (since the
        # jax_platforms restriction) also hides real TPUs from THIS
        # process — probe for the chip in a clean subprocess instead,
        # and run the gate there too (round-4 finding: the in-process
        # probe made the whole module silently skip ON TPU HOSTS)
        import subprocess
        import sys
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() == 'tpu'"],
            capture_output=True, timeout=300,
            env=_clean_env())
        return ["subprocess"] if probe.returncode == 0 else []


def _clean_env():
    import os
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in t)
    return env


pytestmark = pytest.mark.skipif(
    not _tpu_devices(), reason="no TPU visible; scoped-VMEM limits are "
                               "only enforced by the TPU compiler")


_GATE_BODY = """
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lemevit_tpu.models import create_model
name = {name!r}
model = create_model(name, num_classes=1000, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jnp.zeros((256, 224, 224, 3), jnp.float32)
labels = jnp.zeros((256,), jnp.int32)
variables = jax.eval_shape(model.init, rng, x[:1])
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                      variables["params"])
stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                     variables.get("batch_stats", {{}}))

def loss(p, xx):
    out, _ = model.apply(
        {{"params": p, "batch_stats": stats}}, xx, train=True,
        rngs={{"dropout": jax.random.PRNGKey(1)}},
        mutable=["batch_stats"])
    logp = jax.nn.log_softmax(out.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], 1).mean()

# AOT compile only (no execution): the round-2 failure was at compile
jax.jit(jax.grad(loss)).lower(params, x).compile()
print("GATE_OK", name)
"""


@pytest.mark.parametrize("name", ["lemevit_tiny", "lemevit_small",
                                  "lemevit_base", "lemevit_tiny_v2",
                                  "lemevit_small_v2", "vit_tiny"])
def test_train_step_compiles_on_tpu(name):
    """Runs in a clean subprocess: the pytest process itself is pinned to
    CPU by conftest, and the scoped-VMEM failure mode under test only
    exists in the real TPU compiler."""
    import subprocess
    import sys
    proc = subprocess.run(
        [sys.executable, "-c", _GATE_BODY.format(name=name)],
        capture_output=True, text=True, timeout=3000, env=_clean_env(),
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert proc.returncode == 0 and f"GATE_OK {name}" in proc.stdout, \
        f"{proc.stdout[-1000:]}\n{proc.stderr[-4000:]}"
