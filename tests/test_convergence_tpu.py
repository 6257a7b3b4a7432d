"""On-TPU convergence smoke: the framework FEEDS ITSELF and learns.

VERDICT r3 item 9 / r4 item 1a: train lemevit_tiny loader-fed on the real
JPEG corpus (scripts/make_corpus.py — classes are separable by hue/stripe
orientation), on the chip, through cli/train.py itself, with EMA, eval,
checkpointing and mid-run resume exercised; assert the loss falls and
accuracy clears a bar a broken model can't (reference contract:
engine.py:12-174 train_one_epoch + validate).

The conftest pins the pytest process to CPU, so BOTH the TPU probe and
the training run happen in a clean TPU-visible subprocess (the same
pattern as test_train_compile.py — the in-process probe made this module
silently skip on TPU hosts for two rounds).

Run explicitly on hardware (~6 min):
  python -m pytest tests/test_convergence_tpu.py -m slow
Needs .e2e_data + .e2e_data_packed (make_corpus.py + pack.py).
"""
import csv
import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DATA = os.path.join(ROOT, ".e2e_data")
PACKED = os.path.join(ROOT, ".e2e_data_packed")


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
    pytest.mark.skipif(not os.path.isdir(PACKED),
                       reason="corpus not built (scripts/make_corpus.py"
                              " + scripts/pack.py)"),
    pytest.mark.skipif(not _tpu_via_subprocess(),
                       reason="convergence smoke runs on TPU"),
]

_BODY = """
import json
import jax
jax.config.update("jax_compilation_cache_dir",
                  {root!r} + "/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lemevit_tpu.cli.train import build_parser, train
from lemevit_tpu.utils.parser import parse_args_with_config

# Recipe calibrated on-chip (r5): 32 epochs, lr-base 4e-3 (actual 1e-3
# at batch 128), warmup 2 — reaches ~92% top1 / ~0.75 train loss by
# epoch 27 (12 epochs at lr-base 4e-3 gave 57%, the r4 6-epoch recipe
# 52%: the corpus needs ~500 steps, not ~100).
base = ["--data-dir", {data!r}, "--packed-data", {packed!r},
        "--num-classes", "16", "--model", "lemevit_tiny",
        "--batch-size", "128", "--workers", "1",
        "--mixup", "0", "--cutmix", "0", "--reprob", "0",
        "--aa", "", "--drop-path", "0.05",
        "--lr-base", "4e-3", "--warmup-epochs", "2",
        "--eval-interval", "4", "--log-interval", "18",
        "--output", {out!r}, "--experiment", "conv"]

# phase 1: four epochs
args, _ = parse_args_with_config(build_parser(), base + ["--epochs", "4"])
res1 = train(args)

# phase 2: auto-resume from the phase-1 checkpoint, train to epoch 32
args2, _ = parse_args_with_config(build_parser(), base + ["--epochs", "32"])
res2 = train(args2)

print("RESULT " + json.dumps({{
    "steps1": res1["steps"], "steps2": res2["steps"],
    "best_top1": res2["best_top1"]}}))
"""


def test_tiny_learns_the_corpus_with_resume(tmp_path):
    out = str(tmp_path / "runs")
    body = _BODY.format(root=ROOT, data=DATA, packed=PACKED, out=out)
    proc = subprocess.run(
        [sys.executable, "-c", body], capture_output=True, text=True,
        timeout=3000, env=_clean_env(), cwd=ROOT)
    assert proc.returncode == 0, \
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    import json
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")]
    assert line, proc.stdout
    res = json.loads(line[-1][len("RESULT "):])

    steps_per_epoch = 2400 // 128
    assert res["steps1"] == 4 * steps_per_epoch
    assert res["steps2"] == 32 * steps_per_epoch  # resumed, not restarted

    rows = list(csv.DictReader(
        open(os.path.join(out, "conv", "summary.csv"))))
    assert len(rows) == 32
    losses = [float(r["train_loss"]) for r in rows]
    # deep fall: from the ~2.7 start to under 1.0 — the smoothing-0.1
    # floor for 16 classes is ~0.57, so <1.0 means the model genuinely
    # fits; a broken model can't get there (calibration run: 0.75)
    assert losses[0] > 2.0, losses
    assert losses[-1] < 1.0, losses
    # eval ran on the fixed schema (top1 column present even though
    # early epochs had no eval); bar far above random (6.25%) and far
    # above what a crippled model reaches (calibration: 92.6%)
    top1 = max(float(r["top1"] or 0) for r in rows)
    assert top1 >= 80.0, rows
    assert res["best_top1"] >= 80.0
