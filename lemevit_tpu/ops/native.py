"""ctypes bindings for the native host-ops library (native/libleme_ops.so).

Host-side C++ implementations of NMS / rotated IoU for eval post-processing,
mirroring how the reference keeps its detection ops native
(object_detection/mmdet/ops/*). Auto-builds with make on first use when a
compiler is available; every function has a JAX/numpy fallback so the
framework never hard-requires the .so.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libleme_ops.so"))
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
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.leme_nms.restype = ctypes.c_int
    lib.leme_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
    lib.leme_soft_nms.restype = None
    lib.leme_soft_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_int,
                                  ctypes.c_float]
    lib.leme_box_iou_rotated.restype = None
    lib.leme_box_iou_rotated.argtypes = [f32p, ctypes.c_int, f32p,
                                         ctypes.c_int, ctypes.c_int, f32p]
    lib.leme_obb_nms.restype = ctypes.c_int
    lib.leme_obb_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float, i32p]
    lib.leme_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def version() -> str:
    lib = _load()
    if lib is None:
        return "unavailable"
    return lib.leme_version().decode()


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float32)


def nms(boxes, scores, iou_threshold: float = 0.5) -> np.ndarray:
    """Host NMS. Returns bool keep mask (N,)."""
    lib = _load()
    boxes = _f32(boxes)
    scores = _f32(scores)
    n = len(boxes)
    if lib is None:
        from lemevit_tpu.ops.boxes import nms as jnms
        return np.asarray(jnms(boxes, scores, iou_threshold))
    keep = np.zeros(n, np.int32)
    lib.leme_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_threshold,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep.astype(bool)


def soft_nms(boxes, scores, iou_threshold: float = 0.3, sigma: float = 0.5,
             method: str = "linear",
             score_threshold: float = 1e-3) -> np.ndarray:
    lib = _load()
    boxes = _f32(boxes)
    scores = _f32(scores).copy()
    if lib is None:
        from lemevit_tpu.ops.boxes import soft_nms as jsoft
        return np.asarray(jsoft(boxes, scores, iou_threshold, sigma, method,
                                score_threshold))
    lib.leme_soft_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(boxes), iou_threshold, sigma,
        1 if method == "gaussian" else 0, score_threshold)
    return scores


def box_iou_rotated(a, b, mode: str = "iou") -> np.ndarray:
    lib = _load()
    a = _f32(a)
    b = _f32(b)
    if lib is None:
        from lemevit_tpu.ops.rotated import box_iou_rotated as jrot
        return np.asarray(jrot(a, b, mode=mode))
    out = np.zeros((len(a), len(b)), np.float32)
    lib.leme_box_iou_rotated(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        1 if mode == "iof" else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def obb_nms(boxes, scores, iou_threshold: float = 0.1,
            min_size: float = 1e-2) -> np.ndarray:
    lib = _load()
    boxes = _f32(boxes)
    scores = _f32(scores)
    if lib is None:
        from lemevit_tpu.ops.rotated import obb_nms as jobb
        return np.asarray(jobb(boxes, scores, iou_threshold, min_size))
    keep = np.zeros(len(boxes), np.int32)
    lib.leme_obb_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(boxes), iou_threshold, min_size,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep.astype(bool)
