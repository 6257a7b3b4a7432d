"""Segmentation CLI smoke + metric math."""
import numpy as np
import pytest


def test_seg_metrics_perfect():
    from lemevit_tpu.cli.train_seg import seg_metrics
    conf = np.diag([10, 20, 30])
    m = seg_metrics(conf)
    assert m["mIoU"] == pytest.approx(100.0)
    assert m["OA"] == pytest.approx(100.0)
    assert m["mF1"] == pytest.approx(100.0)


def test_seg_metrics_known_case():
    from lemevit_tpu.cli.train_seg import seg_metrics
    # 2-class: gt [10, 10]; class0: tp 8, fp 2 (from class1), fn 2
    conf = np.array([[8, 2], [2, 8]])
    m = seg_metrics(conf)
    assert m["OA"] == pytest.approx(80.0)
    assert m["mIoU"] == pytest.approx(8 / 12 * 100)
    assert m["mF1"] == pytest.approx(80.0)


def test_seg_cli_smoke(tmp_path):
    from lemevit_tpu.cli.train_seg import main
    res = main([
        "--synthetic", "--backbone", "lemevit_micro", "--crop-size", "32",
        "--batch-size", "2", "--iters", "2", "--eval-interval", "2",
        "--channels", "16", "--num-classes", "3",
        "--output", str(tmp_path), "--workers", "1",
    ])
    assert res["steps"] == 2
    assert "mIoU" in res["final_metrics"]
