"""Hub / shard dataset adapters: hfds (HuggingFace datasets), tfds
(TensorFlow Datasets), wds (WebDataset tar shards).

Covers the reference factory's prefixed branches
(/root/reference/data/dataset_factory.py:161-215, which delegates to timm's
hfds/tfds/wds readers). The WebDataset reader is implemented natively on
the stdlib tarfile module with RANDOM ACCESS: member offsets are indexed
once per shard, so it is a map-style dataset compatible with the sharded
strided sampler (no sequential-iteration constraint, no webdataset pip
dependency). hfds / tfds wrap their libraries when installed and raise a
clear error otherwise.
"""
from __future__ import annotations

import glob
import io
import os
import tarfile
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".ppm", ".bmp")


class WebDatasetFolder:
    """Map-style reader over WebDataset-convention tar shards.

    Each sample is the group of tar members sharing a key (basename before
    the first extension): an image ({key}.jpg/...) and a label
    ({key}.cls — ASCII int). `shards` is a glob, a directory, or an
    explicit list of .tar paths. The member index (name, offset, size) is
    built once per shard from the tar headers; __getitem__ then reads the
    image bytes directly at its stored offset."""

    def __init__(self, shards, transform: Optional[Callable] = None,
                 label_ext: str = ".cls"):
        if isinstance(shards, str):
            if os.path.isdir(shards):
                paths = sorted(glob.glob(os.path.join(shards, "*.tar")))
            else:
                paths = sorted(glob.glob(shards))
        else:
            paths = list(shards)
        if not paths:
            raise FileNotFoundError(f"no .tar shards under {shards!r}")
        self.paths = paths
        self.transform = transform
        # index: (shard_idx, img_offset, img_size, label)
        self.index: List[Tuple[int, int, int, int]] = []
        for si, p in enumerate(paths):
            groups: Dict[str, Dict[str, Tuple[int, int]]] = {}
            with tarfile.open(p) as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    base, ext = _split_key(m.name)
                    groups.setdefault(base, {})[ext.lower()] = (
                        m.offset_data, m.size)
                for base in sorted(groups):
                    g = groups[base]
                    img = next((g[e] for e in IMG_EXTS if e in g), None)
                    if img is None:
                        continue
                    label = -1
                    if label_ext in g:
                        off, sz = g[label_ext]
                        fobj = tf.fileobj
                        fobj.seek(off)
                        label = int(fobj.read(sz).decode().strip())
                    self.index.append((si, img[0], img[1], label))
        self._handles: Dict[int, "io.BufferedReader"] = {}

    def __len__(self):
        return len(self.index)

    def _fh(self, si):
        if si not in self._handles:
            self._handles[si] = open(self.paths[si], "rb")
        return self._handles[si]

    def __getitem__(self, i):
        from PIL import Image

        si, off, size, label = self.index[i]
        fh = self._fh(si)
        fh.seek(off)
        img = Image.open(io.BytesIO(fh.read(size))).convert("RGB")
        if self.transform:
            return self.transform(img), label
        return np.asarray(img, np.uint8), label

    def __getstate__(self):  # file handles are per-process
        d = dict(self.__dict__)
        d["_handles"] = {}
        return d


def _split_key(name: str) -> Tuple[str, str]:
    base, ext = os.path.splitext(name)
    return base, ext


class HFDataset:
    """HuggingFace `datasets` hub adapter (map-style): hfds/<name>."""

    def __init__(self, name: str, split: str = "train",
                 transform: Optional[Callable] = None,
                 image_key: str = "image", label_key: str = "label",
                 **load_kwargs):
        try:
            import datasets  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "hfds/ datasets need the `datasets` package (pip install "
                "datasets)") from e
        import datasets as hfds
        self.ds = hfds.load_dataset(name, split=split, **load_kwargs)
        self.transform = transform
        self.image_key = image_key
        self.label_key = label_key

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        row = self.ds[int(i)]
        img = row[self.image_key]
        if hasattr(img, "convert"):
            img = img.convert("RGB")
        label = int(row.get(self.label_key, -1))
        if self.transform:
            return self.transform(img), label
        return np.asarray(img, np.uint8), label


class TFDSDataset:
    """TensorFlow Datasets adapter via tfds.data_source (random access,
    no tf.data graph): tfds/<name>."""

    def __init__(self, name: str, split: str = "train",
                 data_dir: Optional[str] = None,
                 transform: Optional[Callable] = None,
                 image_key: str = "image", label_key: str = "label"):
        try:
            import tensorflow_datasets as tfds  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "tfds/ datasets need the `tensorflow_datasets` package"
            ) from e
        import tensorflow_datasets as tfds
        self.src = tfds.data_source(name, split=split, data_dir=data_dir)
        self.transform = transform
        self.image_key = image_key
        self.label_key = label_key

    def __len__(self):
        return len(self.src)

    def __getitem__(self, i):
        from PIL import Image

        row = self.src[int(i)]
        img = np.asarray(row[self.image_key])
        label = int(row.get(self.label_key, -1))
        if self.transform:
            return self.transform(Image.fromarray(img)), label
        return img.astype(np.uint8), label


__all__ = ["WebDatasetFolder", "HFDataset", "TFDSDataset"]
