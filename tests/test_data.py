"""Data pipeline tests: datasets, transforms, loader, device-side augment."""
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from lemevit_tpu.data import (
    CDPairDataset,
    ImageFolderDataset,
    ManifestDataset,
    SyntheticDataset,
    ZipImageFolder,
    build_eval_transform,
    build_train_transform,
    create_dataset,
    create_loader,
    mixup_cutmix,
    random_erasing,
)
from lemevit_tpu.data.mixup import normalize
from lemevit_tpu.data.datasets import ZipReader


def _img(path, size=32, color=(255, 0, 0)):
    Image.new("RGB", (size, size), color).save(path)


def test_image_folder_and_loader(tmp_path):
    for cls in ("cat", "dog"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(5):
            _img(d / f"{i}.png")
    ds = create_dataset("imagefolder", str(tmp_path), split="train",
                        transform=build_eval_transform(24, crop_pct=1.0))
    assert len(ds) == 10
    img, label = ds[0]
    assert img.shape == (24, 24, 3) and img.dtype == np.uint8

    loader = create_loader(ds, batch_size=4, is_training=True, num_threads=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 24, 24, 3)
    assert batches[0]["label"].dtype == np.int32


def test_manifest_dataset(tmp_path):
    (tmp_path / "all_img").mkdir()
    names = []
    for i in range(6):
        name = f"im{i}.jpg"
        _img(tmp_path / "all_img" / name)
        names.append(name)
    with open(tmp_path / "train_labels.txt", "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n} {i % 3}\n")
    ds = ManifestDataset(str(tmp_path), split="train")
    assert len(ds) == 6
    img, label = ds[4]
    assert label == 1


def test_zip_folder(tmp_path):
    zpath = tmp_path / "data.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(3):
            p = tmp_path / f"tmp{i}.png"
            _img(p)
            zf.write(p, f"imgs/{i}.png")
    ann = tmp_path / "ann.txt"
    with open(ann, "w") as f:
        for i in range(3):
            f.write(f"imgs/{i}.png {i}\n")
    ds = ZipImageFolder(str(zpath), str(ann))
    img, label = ds[2]
    assert label == 2 and img.size == (32, 32)
    # corrupt-entry fallback produces a random image instead of raising
    img2 = ZipReader.imread(f"{zpath}@missing.png", fallback_size=16)
    assert img2.size == (16, 16)


def test_cd_pairs(tmp_path):
    for sub in ("A", "B", "OUT"):
        (tmp_path / "train" / sub).mkdir(parents=True)
    for i in range(2):
        _img(tmp_path / "train" / "A" / f"{i}.png")
        _img(tmp_path / "train" / "B" / f"{i}.png", color=(0, 255, 0))
        Image.new("L", (32, 32), 255).save(tmp_path / "train" / "OUT" / f"{i}.png")
    ds = CDPairDataset(str(tmp_path), "train")
    (a, b), m = ds[0]
    assert a.size == b.size == m.size == (32, 32)


def test_train_transform_shapes():
    t = build_train_transform(28)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8))
    for _ in range(8):  # exercises random RA ops
        out = t(img)
        assert out.shape == (28, 28, 3) and out.dtype == np.uint8


def test_mixup_cutmix_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((4, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    for i in range(6):
        out, tgt = mixup_cutmix(jax.random.fold_in(rng, i), imgs, labels,
                                num_classes=5, label_smoothing=0.1)
        assert out.shape == imgs.shape
        np.testing.assert_allclose(np.asarray(tgt.sum(-1)), 1.0, rtol=1e-5)


def test_random_erasing_changes_some_pixels():
    rng = jax.random.PRNGKey(1)
    imgs = jnp.zeros((8, 24, 24, 3))
    out = random_erasing(rng, imgs, prob=1.0)
    frac = float((np.asarray(out) != 0).mean())
    assert 0.01 < frac < 0.6


def test_normalize_matches_formula():
    u8 = jnp.full((1, 2, 2, 3), 128, jnp.uint8)
    out = np.asarray(normalize(u8))
    expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(num_samples=4, image_size=8, num_classes=3)
    a1, l1 = ds[2]
    a2, l2 = ds[2]
    np.testing.assert_array_equal(a1, a2)
    assert l1 == l2


def test_image_folder_cache_modes(tmp_path):
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            _img(d / f"{i}.png")
    full = ImageFolderDataset(str(tmp_path), cache_mode="full")
    assert len(full._bytes) == 6
    part = ImageFolderDataset(str(tmp_path), cache_mode="part",
                              rank=1, world_size=2)
    assert len(part._bytes) == 3
    # cached and uncached reads agree
    img_c, lab_c = full[2]
    img_d, lab_d = ImageFolderDataset(str(tmp_path))[2]
    assert lab_c == lab_d
    import numpy as np
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_d))


def test_webdataset_folder(tmp_path):
    """Native WebDataset tar-shard reader: random access + labels."""
    import io
    import tarfile
    from PIL import Image

    rng = np.random.RandomState(0)
    for shard in range(2):
        with tarfile.open(tmp_path / f"shard-{shard:04d}.tar", "w") as tf:
            for j in range(3):
                key = f"s{shard}_{j:03d}"
                img = Image.fromarray(
                    rng.randint(0, 255, (20, 24, 3), np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                _add_tar_bytes(tf, key + ".png", buf.getvalue())
                _add_tar_bytes(tf, key + ".cls",
                               str(shard * 3 + j).encode())

    from lemevit_tpu.data.iterable import WebDatasetFolder
    ds = WebDatasetFolder(str(tmp_path))
    assert len(ds) == 6
    img, label = ds[4]  # random access into the second shard
    assert img.shape == (20, 24, 3) and label == 4
    img0, label0 = ds[0]
    assert label0 == 0
    # factory branch
    from lemevit_tpu.data.datasets import create_dataset
    ds2 = create_dataset("wds", root=str(tmp_path.parent),
                         split=tmp_path.name)
    assert len(ds2) == 6 and ds2[4][1] == 4
    # pickling drops handles (loader threads / processes)
    import pickle
    ds3 = pickle.loads(pickle.dumps(ds))
    assert ds3[2][1] == 2


def _add_tar_bytes(tf, name, payload):
    import io
    import tarfile
    info = tarfile.TarInfo(name)
    info.size = len(payload)
    tf.addfile(info, io.BytesIO(payload))


def test_hfds_tfds_gated():
    """Without the optional libs the adapters raise a clear ImportError."""
    from lemevit_tpu.data.datasets import create_dataset
    for name in ("hfds/imagenet-1k", "tfds/imagenet2012"):
        try:
            create_dataset(name, split="train")
        except ImportError as e:
            assert "package" in str(e)
        except Exception:
            pass  # lib present and reached the hub — fine


class _ArrDataset:
    """Index-identifiable samples for loader-order tests."""

    def __init__(self, n=40, size=8):
        self.n = n
        self.size = size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((self.size, self.size, 3), i % 251, np.uint8)
        return img, i


@pytest.mark.fast
def test_loader_resume_skip_matches_batches():
    """iter_batches(start) yields exactly the tail of the epoch's batch
    order (mid-epoch recovery: no re-training on seen data, no skipped
    tail — advisor round-2 finding)."""
    ds = _ArrDataset(40)
    loader = create_loader(ds, 8, is_training=True, seed=3, num_threads=2)
    full = [b["label"].tolist() for b in loader]
    tail = [b["label"].tolist() for b in loader.iter_batches(2)]
    assert tail == full[2:]


@pytest.mark.fast
def test_loader_process_workers_match_threads():
    """num_procs decode path returns identical batches in identical
    order to the thread path (GIL-free pipeline contract)."""
    ds = _ArrDataset(48)
    lt = create_loader(ds, 8, is_training=True, seed=7, num_threads=2)
    lp = create_loader(ds, 8, is_training=True, seed=7, num_procs=2)
    bt = list(lt)
    bp = list(lp)
    assert len(bt) == len(bp) == 6
    for a, b in zip(bt, bp):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["image"], b["image"])
    # resume skip works on the process path too
    tail = [b["label"].tolist() for b in lp.iter_batches(4)]
    assert tail == [b["label"].tolist() for b in bt[4:]]


@pytest.mark.fast
def test_device_prefetcher_propagates_worker_errors():
    """A loader/device_put failure must raise at the consumer, not
    truncate the epoch as a clean StopIteration (advisor r4 medium)."""
    from lemevit_tpu.data.loader import DevicePrefetcher

    def bad_iter():
        yield {"image": np.zeros((2, 4, 4, 3), np.uint8),
               "label": np.zeros((2,), np.int32)}
        raise RuntimeError("decode exploded")

    it = DevicePrefetcher(bad_iter(), lambda v: v, depth=2)
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)


@pytest.mark.fast
def test_device_prefetcher_close_unblocks_worker():
    """close() retires the worker thread even when the consumer stops
    early (an unconsumed prefetcher must not pin device batches)."""
    from lemevit_tpu.data.loader import DevicePrefetcher

    def many():
        for i in range(100):
            yield {"i": np.asarray([i])}

    it = DevicePrefetcher(many(), lambda v: v, depth=2)
    next(it)
    it.close()
    assert not it._t.is_alive()
