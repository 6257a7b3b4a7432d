"""Dataset adapters.

Covers the reference's data surface (/root/reference/data/):
  - manifest-file remote-sensing datasets: MillionAID / UCM / AID /
    NWPU-RESISC, which read ``{train,valid}_labels*.txt`` manifests plus an
    ``all_img/`` folder (dataset.py:16-227). The reference's UCMDataset is
    broken (dataset.py:120 assigns ``img = self.t``); ours is functional.
  - ImageFolder (class-per-subdir) and zip-backed ImageFolder with
    ``archive.zip@inner/path`` addressing (zipreader.py:93-103 semantics,
    including the corrupt-image fallback).
  - CDD/LEVIR change-detection pair layout: ``{split}/A``, ``{split}/B``,
    ``{split}/OUT`` (change_detection/utils/dataloaders.py:10-45).
  - SyntheticDataset for benchmarks and tests.

A dataset is anything with __len__ and __getitem__ -> (PIL.Image | np.ndarray,
label). Decoding is host-side; everything after the batch boundary is device.
"""
from __future__ import annotations

import io
import os
import zipfile
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
    HAS_PIL = True
except ImportError:  # pragma: no cover
    HAS_PIL = False

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


def _pil_open(path_or_bytes):
    if isinstance(path_or_bytes, bytes):
        img = Image.open(io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    return img.convert("RGB")


class SyntheticDataset:
    """Deterministic random images; replaces disk IO in benchmarks/tests."""

    def __init__(self, num_samples: int = 1024, image_size: int = 224,
                 num_classes: int = 1000, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = image_size
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        img = rng.randint(0, 256, (self.image_size, self.image_size, 3),
                          dtype=np.uint8)
        return img, int(rng.randint(self.num_classes))


class ImageFolderDataset:
    """Standard class-per-subdirectory layout.

    cache_mode (reference cached_image_folder.py:123-143 semantics):
      'no'   — read from disk every access
      'full' — preload all encoded bytes into RAM at construction
      'part' — rank-strided byte caching: this rank preloads its stride of
               the dataset; other samples read from disk
    """

    def __init__(self, root: str, transform: Optional[Callable] = None,
                 class_map: Optional[Dict[str, int]] = None,
                 cache_mode: str = "no", rank: int = 0,
                 world_size: int = 1):
        self.root = root
        self.transform = transform
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = class_map or {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTS):
                    self.samples.append(
                        (os.path.join(cdir, fn), self.class_to_idx[c]))
        self._bytes: Dict[int, bytes] = {}
        if cache_mode in ("full", "part"):
            step = 1 if cache_mode == "full" else world_size
            start = 0 if cache_mode == "full" else rank
            for i in range(start, len(self.samples), step):
                with open(self.samples[i][0], "rb") as f:
                    self._bytes[i] = f.read()

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, label = self.samples[i]
        if self.transform is not None and getattr(
                self.transform, "wants_encoded", False):
            data = self._bytes.get(i)
            if data is None:
                with open(path, "rb") as f:
                    data = f.read()
            return self.transform(data), label
        img = _pil_open(self._bytes.get(i, path))
        if self.transform:
            img = self.transform(img)
        return img, label


class ManifestDataset:
    """Remote-sensing manifest format: a labels txt with
    ``<relpath-or-name> <class-index>`` lines + an image directory.

    Generalizes the reference's MillionAID/UCM/AID/NWPU loaders
    (/root/reference/data/dataset.py), which differ only in manifest file
    names, image subdir, and train fraction.
    """

    manifest_train = "train_labels.txt"
    manifest_val = "valid_labels.txt"
    img_subdir = "all_img"

    def __init__(self, root: str, split: str = "train",
                 transform: Optional[Callable] = None,
                 manifest: Optional[str] = None):
        self.root = root
        self.transform = transform
        mf = manifest or (self.manifest_train if split == "train"
                          else self.manifest_val)
        self.samples: List[Tuple[str, int]] = []
        with open(os.path.join(root, mf)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name, _, label = line.rpartition(" ")
                self.samples.append(
                    (os.path.join(root, self.img_subdir, name), int(label)))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, label = self.samples[i]
        if self.transform is not None and getattr(
                self.transform, "wants_encoded", False):
            with open(path, "rb") as f:
                return self.transform(f.read()), label
        img = _pil_open(path)
        if self.transform:
            img = self.transform(img)
        return img, label


class MillionAIDDataset(ManifestDataset):
    pass


class UCMDataset(ManifestDataset):
    manifest_train = "train_labels_55.txt"
    manifest_val = "valid_labels_55.txt"
    img_subdir = "all_img"


class AIDDataset(ManifestDataset):
    manifest_train = "train_labels_55.txt"
    manifest_val = "valid_labels_55.txt"


class NWPURESISCDataset(ManifestDataset):
    manifest_train = "train_labels_19.txt"
    manifest_val = "valid_labels_19.txt"


class ZipReader:
    """``archive.zip@inner/path`` addressing with a zipfile handle bank and a
    corrupt-image fallback to random pixels (matches the tolerance behavior
    of /root/reference/data/zipreader.py:93-103)."""

    _bank: Dict[str, zipfile.ZipFile] = {}

    @classmethod
    def split_path(cls, path: str) -> Tuple[str, str]:
        if "@" not in path:
            raise ValueError(f"zip path must be 'x.zip@inner', got {path!r}")
        zip_path, _, inner = path.partition("@")
        return zip_path, inner

    @classmethod
    def handle(cls, zip_path: str) -> zipfile.ZipFile:
        zf = cls._bank.get(zip_path)
        if zf is None:
            zf = zipfile.ZipFile(zip_path, "r")
            cls._bank[zip_path] = zf
        return zf

    @classmethod
    def read(cls, path: str) -> bytes:
        zip_path, inner = cls.split_path(path)
        return cls.handle(zip_path).read(inner)

    @classmethod
    def imread(cls, path: str, fallback_size: int = 224):
        try:
            return _pil_open(cls.read(path))
        except Exception:
            arr = np.random.randint(0, 256,
                                    (fallback_size, fallback_size, 3),
                                    dtype=np.uint8)
            return Image.fromarray(arr)


class ZipImageFolder:
    """Image folder stored inside a zip, with an annotation map file of
    ``inner/path<TAB or space>class`` lines (reference cached_image_folder
    ann-file mode)."""

    def __init__(self, zip_path: str, ann_file: str,
                 transform: Optional[Callable] = None):
        self.zip_path = zip_path
        self.transform = transform
        self.samples: List[Tuple[str, int]] = []
        with open(ann_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name, _, label = line.rpartition("\t" if "\t" in line else " ")
                self.samples.append((name, int(label)))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        inner, label = self.samples[i]
        img = ZipReader.imread(f"{self.zip_path}@{inner}")
        if self.transform:
            img = self.transform(img)
        return img, label


class CDPairDataset:
    """Change-detection pairs: {split}/A/*.png, {split}/B/*.png,
    {split}/OUT/*.png binary masks. Returns ((imgA, imgB), mask)."""

    def __init__(self, root: str, split: str = "train",
                 transform: Optional[Callable] = None):
        self.dir_a = os.path.join(root, split, "A")
        self.dir_b = os.path.join(root, split, "B")
        self.dir_m = os.path.join(root, split, "OUT")
        self.names = sorted(
            fn for fn in os.listdir(self.dir_a)
            if fn.lower().endswith(IMG_EXTS))
        self.transform = transform

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        n = self.names[i]
        a = _pil_open(os.path.join(self.dir_a, n))
        b = _pil_open(os.path.join(self.dir_b, n))
        m = Image.open(os.path.join(self.dir_m, n)).convert("L")
        if self.transform:
            a, b, m = self.transform(a, b, m)
        return (a, b), m


def create_dataset(name: str, root: str = "", split: str = "train",
                   transform: Optional[Callable] = None, **kwargs):
    """Factory covering the reference's dataset names
    (/root/reference/data/dataset_factory.py:112-229)."""
    name = name.lower()
    # prefixed hub/shard branches (reference dataset_factory.py:161-215)
    if name.startswith("hfds/"):
        from lemevit_tpu.data.iterable import HFDataset
        return HFDataset(name[5:], split=split, transform=transform,
                         **kwargs)
    if name.startswith("tfds/"):
        from lemevit_tpu.data.iterable import TFDSDataset
        return TFDSDataset(name[5:], split=split,
                           data_dir=root or None, transform=transform,
                           **kwargs)
    if name.startswith("wds/") or name == "wds":
        from lemevit_tpu.data.iterable import WebDatasetFolder
        shards = kwargs.pop("shards", None)
        if shards is None:
            shards = os.path.join(root, split) if root else name[4:]
        return WebDatasetFolder(shards, transform=transform, **kwargs)
    table = {
        "millionaid": MillionAIDDataset,
        "torch/millionaid": MillionAIDDataset,
        "ucm": UCMDataset,
        "aid": AIDDataset,
        "nwpu": NWPURESISCDataset,
        "nwpu_resisc45": NWPURESISCDataset,
    }
    if name in table:
        return table[name](root, split=split, transform=transform)
    if name in ("synthetic", "fake"):
        return SyntheticDataset(**kwargs)
    if name in ("imagefolder", "folder", "image_folder", ""):
        split_dir = os.path.join(root, split)
        return ImageFolderDataset(
            split_dir if os.path.isdir(split_dir) else root,
            transform=transform)
    if name == "zipfolder":
        return ZipImageFolder(transform=transform, **kwargs)
    if name in ("cdd", "levir", "cd_pairs"):
        return CDPairDataset(root, split=split, transform=transform)
    raise ValueError(f"unknown dataset {name!r}")
