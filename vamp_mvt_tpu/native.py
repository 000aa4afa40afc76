"""ctypes bindings for the native host-side library (native/vamp_native.cpp).

Provides C++ implementations of the pointcloud filters and the CAPT build —
the host-side latency-sensitive preprocessing the reference implements in C++
(collision/filter.hh, filter_centervox.hh, capt.hh).  Falls back silently to
the numpy implementations when the library hasn't been built; build with
`make -C native` (done automatically on first import if a compiler exists).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libvamp_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_LIB_DIR)], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.vamp_scdf_filter.restype = ctypes.c_int
    lib.vamp_scdf_filter.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        f32p, f32p, f32p, ctypes.c_int, i32p,
    ]
    lib.vamp_centervox_filter.restype = ctypes.c_int
    lib.vamp_centervox_filter.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        f32p, f32p, f32p, i32p,
    ]
    lib.vamp_capt_build.restype = ctypes.c_int
    lib.vamp_capt_build.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p, f32p, f32p, ctypes.c_int, i32p, f32p,
    ]
    try:
        lib.vamp_voxel_mindist2.restype = None
        lib.vamp_voxel_mindist2.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, f32p,
        ]
    except AttributeError:  # stale .so from an earlier build
        lib.vamp_voxel_mindist2 = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def scdf_filter(pc, min_dist, max_range, origin, wmin, wmax, cull=True):
    """Native SCDF filter; returns the kept points or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pc = np.ascontiguousarray(pc, np.float32)
    out = np.empty(len(pc), np.int32)
    cnt = lib.vamp_scdf_filter(
        pc, len(pc), min_dist, max_range,
        np.ascontiguousarray(origin, np.float32),
        np.ascontiguousarray(wmin, np.float32),
        np.ascontiguousarray(wmax, np.float32),
        int(cull), out,
    )
    return pc[out[:cnt]]


def centervox_filter(pc, voxel_size, max_range, origin, wmin, wmax):
    lib = _load()
    if lib is None:
        return None
    pc = np.ascontiguousarray(pc, np.float32)
    out = np.empty(len(pc), np.int32)
    cnt = lib.vamp_centervox_filter(
        pc, len(pc), voxel_size, max_range,
        np.ascontiguousarray(origin, np.float32),
        np.ascontiguousarray(wmin, np.float32),
        np.ascontiguousarray(wmax, np.float32),
        out,
    )
    return pc[out[:cnt]]


def voxel_mindist2(points, wmin, cell, W, win):
    """Native windowed per-voxel min squared center distance; (W,W,W) f32
    with +inf beyond every point's window (true distance > win*cell there).
    Returns None if unavailable."""
    lib = _load()
    fn = getattr(lib, "vamp_voxel_mindist2", None) if lib is not None else None
    if fn is None:
        return None
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    out = np.empty(W * W * W, np.float32)
    fn(
        points, len(points), np.ascontiguousarray(wmin, np.float32),
        np.float32(cell), int(W), int(win), out,
    )
    return out.reshape(W, W, W)


def capt_build_arrays(points, r_min, r_max, r_point):
    """Native CAPT build; returns (tests, leaf_aabb, aff_flat, aff_start,
    top_aabb, nlog2) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    nlog2 = 0
    while (1 << nlog2) < n:
        nlog2 += 1
    size = 1 << nlog2
    tests = np.empty(max(size - 1, 1), np.float32)
    leaf_aabb = np.empty((size, 6), np.float32)
    aff_start = np.empty(size + 1, np.int32)
    top_aabb = np.empty(6, np.float32)
    cap = max(size * 64, 4096)
    while True:
        aff_flat = np.empty((cap, 3), np.float32)
        total = lib.vamp_capt_build(
            points, n, r_min, r_max, r_point,
            tests, leaf_aabb.reshape(-1), aff_flat.reshape(-1), cap,
            aff_start, top_aabb,
        )
        if total >= 0:
            return tests[: size - 1], leaf_aabb, aff_flat[:total], aff_start, top_aabb, nlog2
        cap *= 4
