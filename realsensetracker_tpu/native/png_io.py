"""ctypes front-end for the native PNG16 decoder (native/src/png16.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from realsensetracker_tpu.native import load


def read_png16(path: str) -> np.ndarray:
    """Decode an 8/16-bit grayscale PNG to a uint16 (H, W) array."""
    lib = load()
    dims = np.zeros(4, np.int32)
    rc = lib.png16_read_header(path.encode(), dims.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"{path}: PNG header read failed ({rc})")
    w, h = int(dims[0]), int(dims[1])
    out = np.zeros((h, w), np.uint16)
    rc = lib.png16_decode(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"{path}: PNG decode failed ({rc})")
    return out
