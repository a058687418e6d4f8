"""ctypes bindings for the native C++ geometry engine (native/geometry.cpp).

Builds the shared library with g++ on first use (cached under
native/build/); every entry point has a pure-Python equivalent in
ops/contours.py, so environments without a compiler lose only speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "geometry.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libgeometry.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.ig_trace_contours.restype = ctypes.c_int
        lib.ig_trace_contours.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        lib.ig_approx_polydp.restype = ctypes.c_int64
        lib.ig_approx_polydp.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, ctypes.c_void_p]
        lib.ig_fill_polygon.restype = None
        lib.ig_fill_polygon.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64]
        lib.ig_label_components.restype = None
        lib.ig_label_components.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return _lib


def trace_contours(mask: np.ndarray) -> Optional[List[np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    max_pts = int(16 * h * w + 64)  # tracing can revisit pixels on thin chains
    max_contours = int(h * w // 2 + 16)
    pts = np.empty((max_pts, 2), np.int32)
    offsets = np.empty(max_contours + 1, np.int64)
    n = lib.ig_trace_contours(m.ctypes.data, h, w, pts.ctypes.data,
                              max_pts, offsets.ctypes.data, max_contours)
    if n < 0:
        return None
    return [pts[offsets[i]:offsets[i + 1]].copy() for i in range(n)]


def approx_poly_dp(pts: np.ndarray, epsilon: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts.astype(np.int32))
    out = np.empty_like(p)
    m = lib.ig_approx_polydp(p.ctypes.data, len(p), float(epsilon), out.ctypes.data)
    return out[:m].copy()


def label_components_host(color_id: np.ndarray, valid: np.ndarray,
                          connectivity: int = 8):
    """Host union-find CC — same contract as the device kernel
    ops/connected_components.component_stats (labels = raster-first linear
    index per component, -1 invalid; per-root sizes and bboxes). Returns
    (labels, sizes, bbox) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cid = np.ascontiguousarray(color_id.astype(np.int32, copy=False))
    v = np.ascontiguousarray(valid.astype(np.uint8, copy=False))
    h, w = cid.shape
    labels = np.empty((h, w), np.int32)
    sizes = np.empty(h * w, np.int32)
    bbox = np.empty((h * w, 4), np.int32)
    lib.ig_label_components(cid.ctypes.data, v.ctypes.data, h, w,
                            int(connectivity), labels.ctypes.data,
                            sizes.ctypes.data, bbox.ctypes.data)
    return labels, sizes, bbox


def fill_polygon(mask_out: np.ndarray, pts: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    assert mask_out.dtype == np.uint8 and mask_out.flags.c_contiguous
    p = np.ascontiguousarray(pts.astype(np.int32))
    lib.ig_fill_polygon(mask_out.ctypes.data, mask_out.shape[0],
                        mask_out.shape[1], p.ctypes.data, len(p))
    return True
