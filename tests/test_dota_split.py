"""DOTA tiling + merge tests: window layout, GT IoF filtering/shifting,
detection merge roundtrip, on-the-fly tiled dataset, split CLI."""
import os

import numpy as np
import pytest

from lemevit_tpu.data import dota_split as ds

pytestmark = pytest.mark.fast


def test_iter_windows_cover_and_clamp():
    wins = ds.iter_windows(2048, 1024, size=1024, gap=200)
    xs = sorted({x for x, _ in wins})
    ys = sorted({y for _, y in wins})
    assert ys == [0]
    assert xs[0] == 0 and xs[-1] == 2048 - 1024  # clamped to the edge
    # full coverage with overlap
    assert all(b - a <= 1024 - 200 for a, b in zip(xs, xs[1:]))
    # small image -> single window at origin
    assert ds.iter_windows(512, 512) == [(0, 0)]


def test_tile_name_roundtrip():
    name = ds.tile_name("P0001", 824, 1648)
    assert name == "P0001__1__824___1648"
    assert ds.parse_tile_name(name) == ("P0001", 1.0, 824, 1648)
    # stems containing "__" still parse (greedy stem match)
    n2 = ds.tile_name("P__x", 0, 0)
    assert ds.parse_tile_name(n2)[0] == "P__x"


def _box_poly(cx, cy, w, h):
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy - h / 2,
                     cx + w / 2, cy + h / 2, cx - w / 2, cy + h / 2],
                    np.float32)


def test_split_image_gt_shift_and_iof():
    img = np.zeros((1024, 2048, 3), np.uint8)
    polys = np.stack([
        _box_poly(100, 100, 60, 40),     # fully in tile (0,0)
        _box_poly(1500, 500, 60, 40),    # fully in tiles starting x=824
        _box_poly(1024, 500, 400, 40),   # straddles: partially in both
    ])
    labels = np.arange(3, dtype=np.int32)
    tiles = ds.split_image(img, polys, labels, size=1024, gap=200,
                           iof_thr=0.7)
    by_off = {(t["x0"], t["y0"]): t for t in tiles}
    t0 = by_off[(0, 0)]
    assert 0 in t0["labels"]
    i = list(t0["labels"]).index(0)
    np.testing.assert_allclose(t0["polys"][i], polys[0], atol=1e-4)
    t1 = by_off[(824, 0)]
    assert 1 in t1["labels"]
    j = list(t1["labels"]).index(1)
    np.testing.assert_allclose(t1["polys"][j][0], 1500 - 824 - 30, atol=1e-3)
    # the straddler: in tile (0,0) its in-tile fraction is
    # (1024-824)/400 = 0.5 < 0.7 -> dropped there; in tile (824,0) it's
    # (1224-824)/400 = 1.0 -> kept
    assert 2 not in t0["labels"]
    assert 2 in t1["labels"]


def test_nms_rotated_np_suppresses():
    boxes = np.array([[50, 50, 20, 10, 0.3],
                      [50.5, 50, 20, 10, 0.3],    # near-duplicate
                      [200, 200, 20, 10, -0.5]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = ds.nms_rotated_np(boxes, scores, iou_thr=0.3)
    assert list(keep) == [0, 2]


def test_merge_tile_detections_roundtrip():
    # the same physical object detected in two overlapping tiles
    obj = np.array([900.0, 500.0, 60.0, 30.0, 0.4])
    det_a = obj.copy(); det_a[0] -= 0      # tile at x0=0
    det_b = obj.copy(); det_b[0] -= 824    # tile at x0=824
    other = np.array([100.0, 100.0, 40.0, 20.0, -0.2])
    entries = [
        (ds.tile_name("P7", 0, 0),
         np.stack([det_a, other]), np.array([0.8, 0.9], np.float32),
         np.array([2, 1], np.int32)),
        (ds.tile_name("P7", 824, 0),
         det_b[None], np.array([0.85], np.float32),
         np.array([2], np.int32)),
    ]
    merged = ds.merge_tile_detections(entries, iou_thr=0.1)
    out = merged["P7"]
    assert len(out["scores"]) == 2  # duplicate collapsed, distinct kept
    cls2 = out["boxes"][out["labels"] == 2][0]
    np.testing.assert_allclose(cls2, obj, atol=1e-3)  # original coords
    assert float(out["scores"][out["labels"] == 2][0]) == pytest.approx(0.85)


@pytest.fixture()
def dota_root(tmp_path):
    from PIL import Image
    root = tmp_path / "dota"
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "annfiles").mkdir(parents=True)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (1400, 2000, 3), np.uint8)
        Image.fromarray(img).save(root / split / "images" / "P0001.png")
        with open(root / split / "annfiles" / "P0001.txt", "w") as f:
            f.write("imagesource:GoogleEarth\n")
            p1 = _box_poly(300, 300, 80, 40)
            p2 = _box_poly(1500, 900, 60, 60)
            f.write(" ".join(f"{v:.1f}" for v in p1) + " plane 0\n")
            f.write(" ".join(f"{v:.1f}" for v in p2) + " ship 0\n")
    return str(root)


def test_tiled_dataset(dota_root):
    tds = ds.TiledDOTADataset(dota_root, "val", size=1024, gap=200,
                              keep_empty=True)
    # xs = [0, 824, 976(clamped)], ys = [0, 376(clamped)] -> 3x2 windows
    assert len(tds) == 6
    total_gt = 0
    for i in range(len(tds)):
        tile, obbs, labels = tds[i]
        assert tile.shape == (1024, 1024, 3)
        total_gt += len(obbs)
        for b in obbs:  # shifted into tile frame
            assert -512 < b[0] < 1536 and -512 < b[1] < 1536
    assert total_gt >= 2  # every object appears in at least one tile
    gts = tds.original_gts()
    assert set(gts) == {"P0001"}
    assert len(gts["P0001"]["boxes"]) == 2
    np.testing.assert_allclose(gts["P0001"]["boxes"][0][:2], [300, 300],
                               atol=1e-3)


def test_split_dataset_cli(dota_root, tmp_path):
    from lemevit_tpu.cli.dota_split import main
    dst = str(tmp_path / "tiled")
    totals = main(["--src", dota_root, "--dst", dst, "--splits", "train"])
    assert totals["train"] >= 2
    imgs = os.listdir(os.path.join(dst, "train", "images"))
    anns = os.listdir(os.path.join(dst, "train", "annfiles"))
    assert len(imgs) == len(anns) == totals["train"]
    # tiles parse back and annotations reload through the tile reader
    from lemevit_tpu.data.detection import DOTADataset
    tiled = DOTADataset(dst, "train")
    img, obbs, labels = tiled[0]
    assert img.shape == (1024, 1024, 3)
    assert len(obbs) >= 1
