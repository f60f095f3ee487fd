"""Host-side (NumPy) depth-unit policy, shared by every ingestion surface.

The framework moves INTEGER depth frames (native RealSense Z16 /
TUM 16-bit PNG raw units) to the device as uint16 -- half the
host->device bytes of f32, converted to meters INSIDE the compiled
programs (ops/pyramid.depth_to_meters) -- while float frames are always
meters. These helpers are the single source of truth for the host side
of that contract; five call sites (SLAM host logic, the CLI viewer
path, the Tracker facade, the HTTP service, the batched executor)
previously hand-rolled it, and two of them wrapped wide integers with
a bare astype(uint16).
"""
from __future__ import annotations

import numpy as np


def to_meters_np(depth, scale: float) -> np.ndarray:
    """f32 meters from a depth frame of either convention: integer raw
    units scale by ``scale``; floats are already meters."""
    a = np.asarray(depth)
    if np.issubdtype(a.dtype, np.integer):
        return a.astype(np.float32) * np.float32(scale)
    return a.astype(np.float32, copy=False)


def stage_depth_np(depth, scale: float) -> tuple[np.ndarray, bool]:
    """(staged array, is_raw) for the device upload path.

    Integer frames whose values fit uint16 stage RAW (the cheap path);
    wider or negative integer frames convert to f32 meters HERE -- a
    bare ``astype(np.uint16)`` would silently wrap them (100000 ->
    34464, -1 -> 65535) and the tracker would register against garbage.
    Floats stage as f32 meters.
    """
    a = np.asarray(depth)
    if np.issubdtype(a.dtype, np.integer):
        if a.dtype == np.uint16:
            return a, True
        if a.size and (int(a.min()) < 0 or int(a.max()) > 65535):
            return a.astype(np.float32) * np.float32(scale), False
        return a.astype(np.uint16), True
    return a.astype(np.float32, copy=False), False
