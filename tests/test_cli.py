"""CLI smoke tests: train (synthetic, 1 epoch), validate, benchmark — all on
tiny shapes, CPU."""
import json
import os

import numpy as np
import pytest


def test_train_cli_synthetic(tmp_path):
    from lemevit_tpu.cli.train import main
    out = main([
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "2", "--num-classes", "5", "--epochs", "2",
        "--steps-per-epoch", "2", "--warmup-epochs", "1",
        "--output", str(tmp_path), "--log-interval", "1",
        "--workers", "1",
    ])
    assert out["steps"] == 4
    run_dir = tmp_path / "lemevit_micro"
    assert (run_dir / "summary.csv").exists()
    assert (run_dir / "args.yaml").exists()
    ckpts = os.listdir(run_dir / "checkpoints")
    assert any(c.startswith("checkpoint-") for c in ckpts)


def test_summary_csv_schema_with_sparse_eval(tmp_path):
    """--eval-interval 2: epoch 0 writes no eval stats, epoch 1 does.
    The summary must still carry the FULL fixed header (reference
    update_summary contract, main.py:619-629) so DictReader sees the
    eval columns — r4 wrote the header from the first row's keys and
    every later eval column was silently dropped."""
    import csv
    from lemevit_tpu.cli.train import main
    main([
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "2", "--num-classes", "5", "--epochs", "2",
        "--steps-per-epoch", "2", "--warmup-epochs", "1",
        "--eval-interval", "2", "--output", str(tmp_path),
        "--workers", "1",
    ])
    with open(tmp_path / "lemevit_micro" / "summary.csv") as f:
        r = csv.DictReader(f)
        assert r.fieldnames == ["epoch", "train_loss", "epoch_time_s",
                                "top1", "top5", "ema_top1", "ema_top5"]
        rows = list(r)
    assert len(rows) == 2
    assert rows[0]["top1"] == ""            # no eval at epoch 0
    assert float(rows[1]["top1"]) >= 0.0    # eval ran at epoch 1
    assert float(rows[1]["ema_top1"]) >= 0.0


def test_train_cli_resume(tmp_path):
    from lemevit_tpu.cli.train import main
    args = [
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "2", "--num-classes", "5",
        "--steps-per-epoch", "2", "--warmup-epochs", "1",
        "--output", str(tmp_path), "--workers", "1",
    ]
    main(args + ["--epochs", "1"])
    out = main(args + ["--epochs", "2"])  # auto-resume from epoch 1
    assert out["steps"] == 4


def test_validate_cli_synthetic(capsys):
    from lemevit_tpu.cli.validate import main
    res = main([
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "4", "--num-classes", "5", "--max-batches", "2",
        "--workers", "1",
    ])
    assert 0.0 <= res["top1"] <= 100.0
    out = capsys.readouterr().out
    assert "--result" in out
    json.loads(out.split("--result\n")[1])


def test_benchmark_cli(capsys):
    from lemevit_tpu.cli.benchmark import main
    res = main([
        "--model", "lemevit_micro", "--bench", "both", "--batch-size", "2",
        "--img-size", "32", "--num-classes", "5",
        "--num-warm-iter", "1", "--num-bench-iter", "2",
    ])
    assert res["inference"]["samples_per_sec"] > 0
    assert res["train"]["samples_per_sec"] > 0
    assert res["param_count"] > 0.01


def test_config_yaml_two_stage(tmp_path):
    import argparse
    from lemevit_tpu.utils.parser import parse_args_with_config
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="a")
    p.add_argument("--lr", type=float, default=1.0)
    cfg = tmp_path / "c.yaml"
    cfg.write_text("model: b\nlr: 0.5\n")
    # YAML overrides defaults; CLI overrides YAML
    args, text = parse_args_with_config(p, ["-c", str(cfg), "--lr", "0.25"])
    assert args.model == "b" and args.lr == 0.25
    assert "model: b" in text
    # unknown config keys rejected
    bad = tmp_path / "bad.yaml"
    bad.write_text("nope: 1\n")
    with pytest.raises(ValueError):
        parse_args_with_config(p, ["-c", str(bad)])


def test_events_jsonl_written(tmp_path):
    from lemevit_tpu.utils.events import EventWriter
    w = EventWriter(str(tmp_path))
    w.log(1, {"loss": 0.5})
    w.log(2, {"loss": 0.25, "lr": 1e-3})
    lines = open(tmp_path / "events.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 0.25


def test_validate_real_labels(tmp_path):
    """ReaL re-scoring keys real.json by FILENAME, not loader order.

    The 4 val images are named ILSVRC2012_val_00000005..08 (real.json
    entries 4..7, which accept every class -> real_top1 == 100). Entries
    0..3 are empty: the old index-by-iteration-order bug would consume
    those instead and report no real_top1 at all.
    """
    import numpy as np
    from PIL import Image
    from lemevit_tpu.cli.validate import main

    val = tmp_path / "data" / "validation"
    rng = np.random.RandomState(0)
    for cls, nums in [("class_a", (6, 8)), ("class_b", (5, 7))]:
        (val / cls).mkdir(parents=True)
        for i in nums:
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                val / cls / f"ILSVRC2012_val_{i:08d}.JPEG", format="JPEG")
    real = [[] for _ in range(4)] + [list(range(5)) for _ in range(4)]
    path = tmp_path / "real.json"
    path.write_text(json.dumps(real))
    res = main([
        "--model", "lemevit_micro", "--img-size", "32",
        "--dataset", "imagefolder", "--data-dir", str(tmp_path / "data"),
        "--batch-size", "4", "--num-classes", "5",
        "--workers", "1", "--real-labels", str(path),
    ])
    assert res["real_top1"] == pytest.approx(100.0)


def test_visualize_attn(tmp_path):
    from PIL import Image
    import numpy as np
    img_path = tmp_path / "img.png"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 64, 3), np.uint8)).save(img_path)
    from lemevit_tpu.cli.visualize_attn import main
    main(["--image", str(img_path), "--model", "lemevit_micro",
          "--img-size", "32", "--stage", "1", "--block", "0",
          "--out", str(tmp_path / "vis")])
    outs = list((tmp_path / "vis").iterdir())
    assert len(outs) == 5  # 4 meta tokens + entropy map


def test_validate_bulk(tmp_path):
    """--bulk validates every checkpoint and reports the best."""
    import torch
    from tests import torch_oracle
    cfg = dict(depth=(1, 1, 1, 1, 1), embed_dim=(16, 16, 32, 32, 32),
               head_dim=8, mlp_ratios=(2, 2, 2, 2, 2),
               attn_type=("C", "D", "D", "S", "S"), queries_len=4,
               num_classes=5)
    for i in range(2):
        sd = torch_oracle.make_state_dict(cfg, seed=i)
        torch.save({"state_dict": sd}, str(tmp_path / f"ckpt{i}.pth"))
    from lemevit_tpu.cli import validate as vcli
    # lemevit_micro matches the oracle cfg shapes (same registry config)
    res = vcli.main([
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "4", "--num-classes", "5", "--max-batches", "1",
        "--workers", "1", "--bulk", str(tmp_path / "ckpt*.pth"),
    ])
    assert "checkpoint" in res and res["top1"] >= 0.0


def test_recovery_checkpoint_mid_epoch_resume(tmp_path):
    """Kill/resume mid-epoch: recovery slot restores the exact step."""
    import shutil
    from lemevit_tpu.cli.train import main
    args = [
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "2", "--num-classes", "5",
        "--steps-per-epoch", "4", "--warmup-epochs", "1",
        "--output", str(tmp_path), "--workers", "1",
        "--recovery-interval", "2",
    ]
    main(args + ["--epochs", "1"])
    ckpt_dir = tmp_path / "lemevit_micro" / "checkpoints"
    assert (ckpt_dir / "recovery").is_dir()
    assert (ckpt_dir / "recovery.json").exists()
    # simulate a crash after the last recovery save: drop the epoch-end
    # checkpoints, leaving only the mid-epoch recovery slot (step 4)
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint-"):
            shutil.rmtree(ckpt_dir / name)
    (ckpt_dir / "checkpoints.json").unlink()
    out = main(args + ["--epochs", "2"])  # resumes at step 4 -> 4 more
    assert out["steps"] == 8
