"""ctypes bindings to the native (C++/OpenMP) data-path kernels.

The library (``native/libcosnet_native.so``) fuses the reference's chained
host preprocessing (u8 decode → −mean → ROI crop → resize, each with a
full-image intermediate; ``sbm_rgbd_loader.py:604-663``) into one pass per
output pixel. Built on demand with the in-image g++; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcosnet_native.so")
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        if not _build():
            _load_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.fused_crop_resize_meansub_u8.argtypes = [u8p, i, i, i, i, i, i, i, f32p, f32p, i, i]
    lib.fused_crop_resize_nearest_u8.argtypes = [u8p, i, i, i, i, i, i, u8p, i, i, i]
    lib.resize_bilinear_f32.argtypes = [f32p, i, i, i, f32p, i, i]
    lib.flip_horizontal_f32.argtypes = [f32p, i, i, i]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def fused_crop_resize_meansub(
    src_u8: np.ndarray,
    roi: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    out_hw: Tuple[int, int],
    mean: Optional[np.ndarray],
) -> np.ndarray:
    """u8 HWC (or HW) → f32 HWC at out_hw with ROI crop and mean folded in."""
    lib = get_lib()
    src = np.ascontiguousarray(src_u8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    if roi is not None:
        (x0, x1), (y0, y1) = roi
    else:
        x0, x1, y0, y1 = 0, w - 1, 0, h - 1
    dh, dw = out_hw
    mean_arr = np.ascontiguousarray(mean, dtype=np.float32) if mean is not None else None

    if lib is None:
        crop = src[y0 : y1 + 1, x0 : x1 + 1].astype(np.float32)
        import cv2

        out = cv2.resize(crop, (dw, dh))
        if out.ndim == 2:
            out = out[:, :, None]
        if mean_arr is not None:
            out = out - mean_arr
        return np.ascontiguousarray(out, dtype=np.float32)

    out = np.empty((dh, dw, c), dtype=np.float32)
    lib.fused_crop_resize_meansub_u8(
        _ptr(src, ctypes.c_uint8), h, w, c, y0, y1, x0, x1,
        _ptr(mean_arr, ctypes.c_float) if mean_arr is not None else None,
        _ptr(out, ctypes.c_float), dh, dw,
    )
    return out


def fused_crop_resize_nearest(
    src_u8: np.ndarray,
    roi: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    out_hw: Tuple[int, int],
    binarize: bool,
) -> np.ndarray:
    lib = get_lib()
    src = np.ascontiguousarray(src_u8)
    h, w = src.shape
    if roi is not None:
        (x0, x1), (y0, y1) = roi
    else:
        x0, x1, y0, y1 = 0, w - 1, 0, h - 1
    dh, dw = out_hw
    if lib is None:
        import cv2

        crop = src[y0 : y1 + 1, x0 : x1 + 1]
        if binarize:
            crop = (crop != 0).astype(np.uint8)
        return cv2.resize(crop, (dw, dh), interpolation=cv2.INTER_NEAREST)
    out = np.empty((dh, dw), dtype=np.uint8)
    lib.fused_crop_resize_nearest_u8(
        _ptr(src, ctypes.c_uint8), h, w, y0, y1, x0, x1,
        _ptr(out, ctypes.c_uint8), dh, dw, int(binarize),
    )
    return out
