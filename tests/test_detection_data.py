"""Detection data + mAP eval + CLI smoke tests."""
import os

import numpy as np
import pytest


def test_poly_to_obb_roundtrip():
    from lemevit_tpu.data.detection import poly_to_obb
    from lemevit_tpu.tasks.dota import obb_to_poly_np
    obb = np.array([50, 40, 30, 12, 0.5], np.float32)
    poly = obb_to_poly_np(obb[None])[0]
    rec = poly_to_obb(poly)
    np.testing.assert_allclose(rec, obb, atol=1e-3)


def test_parse_dota_annfile(tmp_path):
    from lemevit_tpu.data.detection import parse_dota_annfile
    ann = tmp_path / "P0001.txt"
    ann.write_text(
        "imagesource:GoogleEarth\n"
        "gsd:0.146\n"
        "10 10 50 10 50 30 10 30 plane 0\n"
        "100 100 140 100 140 120 100 120 ship 1\n"
        "0 0 1 0 1 1 0 1 unknown-class 0\n")
    obbs, labels = parse_dota_annfile(str(ann))
    assert len(obbs) == 2
    np.testing.assert_allclose(obbs[0], [30, 20, 40, 20, 0], atol=1e-3)
    assert labels.tolist() == [0, 6]  # plane, ship
    obbs2, _ = parse_dota_annfile(str(ann), skip_difficult=True)
    assert len(obbs2) == 1


def test_detection_collate():
    from lemevit_tpu.data.detection import SyntheticDetection, \
        detection_collate
    ds = SyntheticDetection(4, 64, 5, max_boxes=3)
    batch = detection_collate([ds[0], ds[1]], max_boxes=8)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_obbs"].shape == (2, 8, 5)
    assert batch["gt_mask"].any()


def test_map_eval_perfect_and_miss():
    from lemevit_tpu.tasks.map_eval import evaluate_map
    gt = {"a": {"boxes": np.array([[10, 10, 30, 30], [50, 50, 70, 70]],
                                  np.float32),
                "labels": np.array([0, 1])}}
    # perfect detections
    det = {"a": {"boxes": gt["a"]["boxes"].copy(),
                 "scores": np.array([0.9, 0.8]),
                 "labels": np.array([0, 1])}}
    m = evaluate_map(det, gt, num_classes=2)
    assert m["mAP"] == pytest.approx(1.0)
    # one wrong-location detection -> class 1 AP = 0
    det2 = {"a": {"boxes": np.array([[10, 10, 30, 30], [0, 0, 5, 5]],
                                    np.float32),
                  "scores": np.array([0.9, 0.8]),
                  "labels": np.array([0, 1])}}
    m2 = evaluate_map(det2, gt, num_classes=2)
    assert m2["AP_0"] == pytest.approx(1.0)
    assert m2["AP_1"] == pytest.approx(0.0)
    assert m2["mAP"] == pytest.approx(0.5)


def test_map_eval_rotated():
    from lemevit_tpu.tasks.map_eval import evaluate_map
    gt = {"x": {"boxes": np.array([[50, 50, 20, 10, 0.4]], np.float32),
                "labels": np.array([0])}}
    det = {"x": {"boxes": np.array([[50, 50, 20, 10, 0.4]], np.float32),
                 "scores": np.array([0.9]), "labels": np.array([0])}}
    m = evaluate_map(det, gt, num_classes=1)
    assert m["mAP"] == pytest.approx(1.0)


def test_det_cli_smoke(tmp_path):
    from lemevit_tpu.cli.train_det import main
    res = main([
        "--synthetic", "--backbone", "lemevit_micro", "--img-size", "64",
        "--batch-size", "2", "--epochs", "1", "--steps-per-epoch", "2",
        "--num-classes", "3", "--num-proposals", "8", "--max-boxes", "4",
        "--fpn-channels", "16", "--output", str(tmp_path), "--workers", "1",
    ])
    assert res["steps"] == 2
    assert -1.0 <= res["best_mAP"] <= 1.0
