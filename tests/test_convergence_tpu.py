"""On-TPU convergence smoke: the framework FEEDS ITSELF and learns.

VERDICT r3 item 9: train lemevit_tiny a few hundred loader-fed steps on
the real JPEG corpus (scripts/make_corpus.py — classes are separable by
hue/stripe orientation), on the chip, through cli/train.py itself, with
EMA, eval, checkpointing and mid-run resume exercised; assert the loss
falls and accuracy beats random by a wide margin (reference contract:
engine.py:12-174 train_one_epoch + validate).

Run explicitly on hardware (skipped on CPU, ~10 min):
  python -m pytest tests/test_convergence_tpu.py -m slow
Needs .e2e_data + .e2e_data_packed (make_corpus.py + pack.py).
"""
import csv
import os
import shutil

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DATA = os.path.join(ROOT, ".e2e_data")
PACKED = os.path.join(ROOT, ".e2e_data_packed")


def _tpu():
    import jax
    try:
        return bool(jax.devices("tpu"))
    except RuntimeError:
        return False


pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(PACKED),
                       reason="corpus not built (scripts/make_corpus.py"
                              " + scripts/pack.py)"),
]


@pytest.mark.skipif(not _tpu(), reason="convergence smoke runs on TPU")
def test_tiny_learns_the_corpus_with_resume(tmp_path):
    from lemevit_tpu.cli.train import build_parser, train
    from lemevit_tpu.utils.parser import parse_args_with_config

    out = str(tmp_path / "runs")
    base = ["--data-dir", DATA, "--packed-data", PACKED,
            "--num-classes", "16", "--model", "lemevit_tiny",
            "--batch-size", "128", "--workers", "1",
            "--mixup", "0", "--cutmix", "0", "--reprob", "0",
            "--aa", "", "--drop-path", "0.05",
            "--lr-base", "1e-3", "--warmup-epochs", "1",
            "--eval-interval", "2", "--log-interval", "6",
            "--output", out, "--experiment", "conv"]

    # phase 1: two epochs
    args, _ = parse_args_with_config(build_parser(), base + [
        "--epochs", "2"])
    res1 = train(args)
    assert res1["steps"] == 2 * (2400 // 128)

    # phase 2: auto-resume from the phase-1 checkpoint, train to epoch 6
    args2, _ = parse_args_with_config(build_parser(), base + [
        "--epochs", "6"])
    res2 = train(args2)
    assert res2["steps"] == 6 * (2400 // 128)   # resumed, not restarted

    rows = list(csv.DictReader(
        open(os.path.join(out, "conv", "summary.csv"))))
    losses = [float(r["train_loss"]) for r in rows]
    assert losses[-1] < losses[0] - 0.3, losses   # loss actually falls
    # eval ran with EMA; the hue/stripe task is easy — require a wide
    # margin over random (6.25%)
    top1 = max(float(r.get("top1") or 0) for r in rows)
    assert top1 > 30.0, rows
    assert res2["best_top1"] > 30.0
    shutil.rmtree(out, ignore_errors=True)
