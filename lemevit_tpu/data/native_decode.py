"""ctypes bindings for the native decode plane (native/libleme_data.so).

C++ JPEG decode + crop + bicubic resample with the GIL released for the
whole call, so the Loader's ordinary THREAD producers scale across host
cores — the role the reference delegates to torch DataLoader worker
processes (/root/reference/main.py:395-448). libjpeg DCT scaling decodes
large sources at 1/2..1/8 resolution when the crop allows, which is the
dominant win on remote-sensing imagery (MillionAID sources are up to
~10k px). Every entry point has a PIL fallback (non-JPEG bytes, CMYK,
missing .so), so the framework never hard-requires the library.
"""
from __future__ import annotations

import ctypes
import math
import os
import random
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libleme_data.so"))
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    crop_args = [u8p, ctypes.c_int,
                 ctypes.c_float, ctypes.c_float, ctypes.c_float,
                 ctypes.c_float,
                 ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.leme_jpeg_size.restype = ctypes.c_int
    lib.leme_jpeg_size.argtypes = [u8p, ctypes.c_int, i32p, i32p]
    lib.leme_jpeg_decode_crop.restype = ctypes.c_int
    lib.leme_jpeg_decode_crop.argtypes = crop_args
    try:
        lib.leme_png_size.restype = ctypes.c_int
        lib.leme_png_size.argtypes = [u8p, ctypes.c_int, i32p, i32p]
        lib.leme_png_decode_crop.restype = ctypes.c_int
        lib.leme_png_decode_crop.argtypes = crop_args
    except AttributeError:  # stale pre-PNG .so on disk
        pass
    _lib = lib
    return _lib


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _codec(lib, data: bytes):
    """(size_fn, decode_fn) for these bytes, or None for neither codec."""
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        return lib.leme_jpeg_size, lib.leme_jpeg_decode_crop
    if (data[:8] == _PNG_MAGIC
            and hasattr(lib, "leme_png_size")):
        return lib.leme_png_size, lib.leme_png_decode_crop
    return None


def available() -> bool:
    return _load() is not None


def _u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def jpeg_size(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the image header alone (JPEG or PNG), or
    None. Keeps its historical name; PNG support rode in later."""
    lib = _load()
    if lib is None or len(data) < 8:
        return None
    codec = _codec(lib, data)
    if codec is None:
        return None
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    if codec[0](_u8p(data), len(data),
                ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


image_size = jpeg_size


def decode_crop(data: bytes, box: Tuple[float, float, float, float],
                out_size: Tuple[int, int],
                hflip: bool = False) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes, crop box=(x0, y0, cw, ch) in original
    coords, bicubic-resample to out_size=(w, h) u8 RGB HWC. None =>
    caller must fall back to PIL (other formats, CMYK, corrupt)."""
    lib = _load()
    if lib is None or len(data) < 8:
        return None
    codec = _codec(lib, data)
    if codec is None:
        return None
    ow, oh = out_size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = codec[1](
        _u8p(data), len(data),
        float(box[0]), float(box[1]), float(box[2]), float(box[3]),
        int(ow), int(oh), int(bool(hflip)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out


# --------------------------------------------------------------- policies

def rrc_box(w: int, h: int, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
            rng: Optional[random.Random] = None
            ) -> Tuple[float, float, float, float]:
    """timm/torchvision RandomResizedCrop box sampling (identical math to
    transforms.random_resized_crop, so the native and PIL paths draw from
    the same crop distribution)."""
    rng = rng or random
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            return (float(x0), float(y0), float(cw), float(ch))
    side = min(w, h)
    return ((w - side) / 2.0, (h - side) / 2.0, float(side), float(side))


def center_box(w: int, h: int, size: int, crop_pct: float = 0.9
               ) -> Tuple[float, float, float, float]:
    """Source box equivalent to resize(short -> size/crop_pct) followed by
    a centered size x size crop (crop-then-resize formulation)."""
    short = min(w, h)
    crop_src = short * size / float(int(math.floor(size / crop_pct)))
    return ((w - crop_src) / 2.0, (h - crop_src) / 2.0, crop_src, crop_src)
