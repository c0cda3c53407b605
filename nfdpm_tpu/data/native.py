"""ctypes binding for the native C++ batch-assembly library.

Loads native/libnfdpm_batch_ops.so (building it with `make -C native` on
first use if a toolchain is available); every entry point has a numpy
fallback so the framework works without the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnfdpm_batch_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                           timeout=120, check=False)
        except Exception:
            pass
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.batch_gather_normalize.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.preprocess_nbits.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def batch_gather_normalize(
    images: np.ndarray, indices: np.ndarray, flips: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """uint8 [N,H,W,C] + int64 [B] (+ uint8 flips [B]) -> fp32 [B,H,W,C] in
    [0,1], horizontally mirrored where flips==1. Native when available."""
    lib = _load()
    n, h, w, c = images.shape
    b = len(indices)
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        out = images[indices].astype(np.float32) / 255.0
        if flips is not None:
            mask = flips.astype(bool)
            out[mask] = out[mask, :, ::-1, :]
        return out
    images = np.ascontiguousarray(images)
    out = np.empty((b, h, w, c), np.float32)
    flips_arr = None
    flips_ptr = None
    if flips is not None:
        flips_arr = np.ascontiguousarray(flips, np.uint8)
        flips_ptr = flips_arr.ctypes.data_as(ctypes.c_void_p)
    lib.batch_gather_normalize(
        images.ctypes.data_as(ctypes.c_void_p), n, h, w, c,
        indices.ctypes.data_as(ctypes.c_void_p), flips_ptr, b,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out
