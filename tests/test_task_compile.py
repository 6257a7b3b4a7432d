"""On-TPU compile gate for the downstream task verticals (VERDICT r4
item 3): UperNet-base 512^2, Oriented R-CNN small 1024^2 (rpn_nms_pre
2000), BIT-small 256^2 — shapes whose token counts (stage-1 N=16384 /
65536) exercise the fused kernels and fold pickers far beyond the
classification gate, the scoped-VMEM/Mosaic failure class of round 2.

Same subprocess pattern as test_train_compile.py: the conftest pins
pytest to CPU, so both the TPU probe and the gate run in clean
subprocesses (scripts/taskbench.py --compile-only, which builds the
EXACT cli train graphs). Compiles cache in .jax_cache_tpu, so reruns
after the first are fast.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in t)
    return env


def _tpu_via_subprocess():
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert jax.default_backend() == 'tpu'"],
        capture_output=True, timeout=300, env=_clean_env())
    return probe.returncode == 0


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not _tpu_via_subprocess(),
                       reason="task-vertical compile gate runs on TPU"),
]


@pytest.mark.parametrize("task", ["seg", "det", "cd"])
def test_task_train_step_compiles_on_tpu(task, tmp_path):
    proc = subprocess.run(
        [sys.executable, "scripts/taskbench.py", "--tasks", task,
         "--compile-only", "--out", str(tmp_path / "out.json")],
        capture_output=True, text=True, timeout=3000, env=_clean_env(),
        cwd=ROOT)
    assert proc.returncode == 0, \
        f"{proc.stdout[-1500:]}\n{proc.stderr[-4000:]}"
    assert f"{task}: compiled" in proc.stdout
