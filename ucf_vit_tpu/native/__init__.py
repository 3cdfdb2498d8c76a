"""ctypes bindings for the native adaptive-patching kernels.

Compiled lazily on first import with g++ (cached next to the source); every
consumer falls back to the pure-numpy implementation if the toolchain or the
.so is unavailable, so the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "patchtree.cpp")
_SO = os.path.join(_HERE, "_patchtree.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.quadtree_build.restype = ctypes.c_int
        lib.quadtree_build.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i64p,
        ]
        lib.octree_build.restype = ctypes.c_int
        lib.octree_build.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int64, ctypes.c_int, i32p, i64p,
        ]
        lib.resize3d.restype = None
        lib.resize3d.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.octree_serialize.restype = None
        lib.octree_serialize.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, i64p, f64p,
        ]
        lib.gaussian3d.restype = None
        lib.gaussian3d.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f64p, ctypes.c_int, f32p,
        ]
        _lib = lib
        return _lib


def quadtree_boxes(edges: np.ndarray, fixed_length: int) -> Optional[np.ndarray]:
    """([n_leaves, 4] (x1,x2,y1,y2) boxes, [n_leaves] values) or None."""
    lib = get_lib()
    if lib is None:
        return None
    edges8 = np.ascontiguousarray(edges, dtype=np.uint8)
    # the split loop runs while count < fixed_length and adds 3 leaves per
    # split, so the leaf count may overshoot by up to 2 (same semantics as
    # the numpy fallback) — size the output for the worst case
    out = np.empty((fixed_length + 2, 4), np.int32)
    vals = np.empty((fixed_length + 2,), np.int64)
    n = lib.quadtree_build(
        edges8, edges8.shape[0], edges8.shape[1], fixed_length, out, vals
    )
    return out[:n], vals[:n]


def octree_boxes(
    edges: np.ndarray, fixed_length: int, norm_factor: int
) -> Optional[np.ndarray]:
    """([n_leaves, 6] (x1,..,z2) boxes, [n_leaves] values) or None."""
    lib = get_lib()
    if lib is None:
        return None
    assert edges.shape[0] == edges.shape[1] == edges.shape[2]
    edges8 = np.ascontiguousarray(edges, dtype=np.uint8)
    # splits add 7 leaves each while count < fixed_length, so the leaf count
    # may overshoot fixed_length by up to 6 (matching the numpy fallback) —
    # size the output for the worst case
    out = np.empty((fixed_length + 6, 6), np.int32)
    vals = np.empty((fixed_length + 6,), np.int64)
    n = lib.octree_build(
        edges8, edges8.shape[0], norm_factor, fixed_length, out, vals
    )
    return out[:n], vals[:n]


def resize3d_native(
    vol: np.ndarray, out_side: int, nearest: bool = False
) -> Optional[np.ndarray]:
    """[n,n,n,c] f32 -> [m,m,m,c] with the reference grid convention."""
    lib = get_lib()
    if lib is None:
        return None
    n = vol.shape[0]
    if not (vol.shape[0] == vol.shape[1] == vol.shape[2]):
        return None
    v = np.ascontiguousarray(vol, dtype=np.float32)
    c = v.shape[3]
    out = np.empty((out_side, out_side, out_side, c), np.float32)
    lib.resize3d(v, n, c, out, out_side, int(nearest))
    return out


def gaussian3d_native(img: np.ndarray, sigma: float):
    """scipy.ndimage.gaussian_filter(img, sigma=(s,s,s,0), mode='reflect')
    bit-exact, for [n0,n1,n2,c] float32 volumes. Returns None when the
    native library is unavailable (callers fall back to scipy)."""
    lib = get_lib()
    if lib is None or img.dtype != np.float32 or img.ndim != 4:
        return None
    try:
        # scipy's own kernel so the weights are identical to the fallback
        from scipy.ndimage._filters import _gaussian_kernel1d
    except Exception:
        return None
    radius = int(4.0 * sigma + 0.5)  # scipy default truncate=4.0
    w = np.ascontiguousarray(_gaussian_kernel1d(sigma, 0, radius)[::-1])
    v = np.ascontiguousarray(img)
    out = np.empty_like(v)
    n0, n1, n2, c = v.shape
    lib.gaussian3d(v, n0, n1, n2, c, w, radius, out)
    return out


def octree_serialize_native(
    img: np.ndarray, boxes: np.ndarray, fixed_length: int, out_side: int,
    nearest: bool = False,
):
    """Batched leaf serialization: one call for the whole octree serialize
    loop (slice + resample + pad). img: [n,n,n,c]; boxes: [n_leaves, 6]
    int32 (x1..z2). Returns (seq_patch [L,m,m,m,c] f32, sizes [L] i64,
    pos [L,3] f64) or None when the native library is unavailable.
    Numerically identical to calling resize3d_native per leaf."""
    lib = get_lib()
    if lib is None:
        return None
    if not (img.shape[0] == img.shape[1] == img.shape[2]):
        return None
    v = np.ascontiguousarray(img, dtype=np.float32)
    b = np.ascontiguousarray(boxes, dtype=np.int32)
    n, c, m = v.shape[0], v.shape[3], out_side
    n_boxes = b.shape[0]
    assert n_boxes <= fixed_length
    dst = np.empty((fixed_length, m, m, m, c), np.float32)
    sizes = np.empty((fixed_length,), np.int64)
    pos = np.empty((fixed_length, 3), np.float64)
    lib.octree_serialize(
        v, n, c, b, n_boxes, fixed_length, m, int(nearest), dst, sizes, pos
    )
    return dst, sizes, pos
