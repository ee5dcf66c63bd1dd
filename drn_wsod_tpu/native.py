"""ctypes bindings for the native evaluation core (native/eval_core.cpp).

Builds the shared library on first use if the toolchain is available;
callers fall back to the pure-numpy paths when it is not (the import never
fails). Equivalent role to the reference's compiled ``detectron2._C`` /
``wsl._C`` extension modules, minus pybind11 (plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libeval_core.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning(f"native eval core unavailable ({e}); "
                           "using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning(f"failed to load {_LIB_PATH}: {e}")
        return None

    lib.voc_match.argtypes = [_f64p, _i32p, _i64, _f64p, _u8p, _i64p, _i64,
                              ctypes.c_double, _u8p, _u8p]
    lib.voc_corloc.argtypes = [_f64p, _i32p, _i64, _f64p, _u8p, _i64p, _i64,
                               ctypes.c_double, _i8p]
    lib.coco_match.argtypes = [_f64p, _i64, _f64p, _u8p, _i64, _f64p, _i64,
                               _u8p, _u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voc_match(det_boxes: np.ndarray, det_img: np.ndarray,
              gt_boxes: np.ndarray, gt_difficult: np.ndarray,
              gt_offsets: np.ndarray, ovthresh: float):
    """Returns (tp, fp) uint8 arrays of shape (D,)."""
    lib = _load()
    assert lib is not None
    D = len(det_boxes)
    tp = np.zeros(D, dtype=np.uint8)
    fp = np.zeros(D, dtype=np.uint8)
    lib.voc_match(np.ascontiguousarray(det_boxes, np.float64),
                  np.ascontiguousarray(det_img, np.int32), D,
                  np.ascontiguousarray(gt_boxes, np.float64),
                  np.ascontiguousarray(gt_difficult, np.uint8),
                  np.ascontiguousarray(gt_offsets, np.int64),
                  len(gt_offsets) - 1, ovthresh, tp, fp)
    return tp, fp


def voc_corloc(det_boxes: np.ndarray, det_img: np.ndarray,
               gt_boxes: np.ndarray, gt_difficult: np.ndarray,
               gt_offsets: np.ndarray, ovthresh: float) -> np.ndarray:
    """Returns per-image int8 verdicts (1 localized / 0 missed / -1 unjudged)."""
    lib = _load()
    assert lib is not None
    n_images = len(gt_offsets) - 1
    verdict = np.zeros(n_images, dtype=np.int8)
    lib.voc_corloc(np.ascontiguousarray(det_boxes, np.float64),
                   np.ascontiguousarray(det_img, np.int32), len(det_boxes),
                   np.ascontiguousarray(gt_boxes, np.float64),
                   np.ascontiguousarray(gt_difficult, np.uint8),
                   np.ascontiguousarray(gt_offsets, np.int64),
                   n_images, ovthresh, verdict)
    return verdict


def coco_match(det_boxes: np.ndarray, gt_boxes: np.ndarray,
               gt_ignore: np.ndarray, iou_thrs: np.ndarray):
    """Returns (tp, ign) uint8 arrays of shape (T, D)."""
    lib = _load()
    assert lib is not None
    D, G, T = len(det_boxes), len(gt_boxes), len(iou_thrs)
    tp = np.zeros((T, D), dtype=np.uint8)
    ign = np.zeros((T, D), dtype=np.uint8)
    lib.coco_match(np.ascontiguousarray(det_boxes, np.float64), D,
                   np.ascontiguousarray(gt_boxes, np.float64),
                   np.ascontiguousarray(gt_ignore, np.uint8), G,
                   np.ascontiguousarray(iou_thrs, np.float64), T, tp, ign)
    return tp, ign


# ---------------------------------------------------------------- JPEG decode
_jpeg_lib: Optional[ctypes.CDLL] = None
_jpeg_tried = False
_JPEG_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libjpeg_decode.so")


def _load_jpeg() -> Optional[ctypes.CDLL]:
    global _jpeg_lib, _jpeg_tried
    if _jpeg_lib is not None or _jpeg_tried:
        return _jpeg_lib
    _jpeg_tried = True
    if not os.path.exists(_JPEG_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning(f"native jpeg decoder unavailable ({e})")
            return None
    try:
        lib = ctypes.CDLL(_JPEG_LIB_PATH)
    except OSError as e:
        logger.warning(f"failed to load {_JPEG_LIB_PATH}: {e}")
        return None
    lib.jpeg_decode_info.argtypes = [
        _u8p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.jpeg_decode.argtypes = [
        _u8p, ctypes.c_size_t, ctypes.c_int, _u8p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _jpeg_lib = lib
    return lib


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def jpeg_decode(data: bytes, scale_num: int = 8) -> Optional[np.ndarray]:
    """Decode JPEG bytes -> (H, W, 3) RGB uint8, optionally prescaled to
    scale_num/8 of the native size in the DCT domain (native/jpeg_decode.cpp).
    Returns None on failure (caller falls back to PIL)."""
    lib = _load_jpeg()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_decode_info(buf, len(data), ctypes.byref(w),
                            ctypes.byref(h)) != 0:
        return None
    ow = -(-w.value * scale_num // 8)
    oh = -(-h.value * scale_num // 8)
    out = np.empty((oh + 1, ow + 1, 3), np.uint8)   # +1 slack for rounding
    rw, rh = ctypes.c_int(), ctypes.c_int()
    rc = lib.jpeg_decode(buf, len(data), scale_num, out.reshape(-1),
                         out.nbytes, ctypes.byref(rw), ctypes.byref(rh))
    if rc != 0:
        return None
    return np.ascontiguousarray(
        out.reshape(-1)[:rh.value * rw.value * 3].reshape(
            rh.value, rw.value, 3))
