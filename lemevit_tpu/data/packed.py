"""Packed uint8 sample cache: decode once, stream forever.

The FFCV-style answer to the host-bound data plane (VERDICT r3 item 1):
JPEG decode costs ~5-10 ms/image/core, so a 1-core host feeds ~150 img/s —
two orders of magnitude under the chip's appetite. Packing decodes every
image ONCE (native C++ plane when available), short-side-resizes +
center-crops to a fixed ``px`` square, and writes one flat uint8 memmap.
After that the loader's per-sample work is a 190 KB memcpy from page
cache (GB/s), and ALL augmentation runs on device (data/device_aug.py).

Tradeoff (documented, standard for packed pipelines): train-time crops are
drawn from the packed square, not the original frame — see device_aug.py.
Pack at px >= ceil(img_size / crop_pct) (256 for 224 @ 0.875) so the eval
center-crop framing matches the reference's resize-then-crop.

Layout: <dir>/images.u8 (N*px*px*3 bytes), labels.npy, meta.json.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

META = "meta.json"
IMAGES = "images.u8"
LABELS = "labels.npy"


def pack_folder(src_root: str, out_dir: str, px: int = 256,
                log_every: int = 500) -> dict:
    """Pack an ImageFolder tree (class-per-subdir) into <out_dir>."""
    from lemevit_tpu.data import native_decode as nd
    from lemevit_tpu.data.datasets import ImageFolderDataset, _pil_open

    ds = ImageFolderDataset(src_root)
    n = len(ds)
    os.makedirs(out_dir, exist_ok=True)
    mm = np.lib.format.open_memmap(
        os.path.join(out_dir, IMAGES + ".npy"), mode="w+",
        dtype=np.uint8, shape=(n, px, px, 3))
    labels = np.zeros(n, np.int32)
    native = nd.available()
    for i, (path, label) in enumerate(ds.samples):
        labels[i] = label
        arr = None
        if native:
            with open(path, "rb") as f:
                data = f.read()
            size = nd.image_size(data)
            if size is not None:
                w, h = size
                side = float(min(w, h))
                box = ((w - side) / 2.0, (h - side) / 2.0, side, side)
                arr = nd.decode_crop(data, box, (px, px))
        if arr is None:  # PIL fallback (non-JPEG/PNG, CMYK, no .so)
            img = _pil_open(path)
            w, h = img.size
            side = min(w, h)
            img = img.resize((px, px), 3,  # BICUBIC
                             box=((w - side) / 2, (h - side) / 2,
                                  (w + side) / 2, (h + side) / 2))
            arr = np.asarray(img, np.uint8)
        mm[i] = arr
        if log_every and (i + 1) % log_every == 0:
            print(f"packed {i + 1}/{n}", flush=True)
    mm.flush()
    np.save(os.path.join(out_dir, LABELS), labels)
    meta = {"n": n, "px": px, "format": "u8 HWC npy",
            "classes": sorted(ds.class_to_idx,
                              key=ds.class_to_idx.get)}
    with open(os.path.join(out_dir, META), "w") as f:
        json.dump(meta, f)
    return meta


class PackedDataset:
    """Reads a packed cache; returns (uint8 (px,px,3), label). Picklable
    (reopens the memmap lazily per process) — safe for spawn workers."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, META)) as f:
            self.meta = json.load(f)
        self.px = int(self.meta["px"])
        self.labels = np.load(os.path.join(root, LABELS))
        self._mm: Optional[np.ndarray] = None

    def _images(self) -> np.ndarray:
        if self._mm is None:
            self._mm = np.load(os.path.join(self.root, IMAGES + ".npy"),
                               mmap_mode="r")
        return self._mm

    def __len__(self):
        return int(self.meta["n"])

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        return np.asarray(self._images()[i]), int(self.labels[i])

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_mm"] = None
        return d
