"""ctypes bindings for the native (C++/OpenMP) host runtime.

Builds native/atvsnet_native.cpp on first use (g++ -O3 -fopenmp) and caches the .so
next to the source. Every entry point has a numpy fallback so the framework works
without a toolchain; the native path is the production one for large point clouds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from atvsnet_tpu.utils import log

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "atvsnet_native.cpp")
_SO = os.path.join(_REPO, "native", "libatvsnet_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.warn(f"native build failed ({e}); using numpy fallbacks")
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.atv_count_mask.restype = ctypes.c_int64
        lib.atv_count_mask.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.atv_compact_points.restype = ctypes.c_int64
        lib.atv_compact_points.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64] + [ctypes.c_void_p] * 2
        lib.atv_compact_backproject.restype = ctypes.c_int64
        lib.atv_compact_backproject.argtypes = (
            [ctypes.c_void_p] * 4 + [ctypes.c_int64] * 2 + [ctypes.c_void_p] * 2
        )
        lib.atv_write_ply.restype = ctypes.c_int
        lib.atv_write_ply.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def compact_points(mask: np.ndarray, points: np.ndarray, colors: np.ndarray):
    """mask (n,) bool/uint8, points (n,3) f32, colors (n,3) float 0..255
    -> (m,3) f32 points, (m,3) u8 colors.

    Deliberate deviation from the reference host loop (fusibile.cu:308): that loop
    silently drops any point with a zero X, Y or Z world coordinate (an artifact of
    zero-initialized buffers doubling as a validity flag); here validity is the
    explicit mask, so points that legitimately lie on a coordinate plane are kept —
    exact point-COUNT parity with the CUDA binary is not expected on such scenes."""
    mask = np.ascontiguousarray(mask.reshape(-1).astype(np.uint8))
    points = np.ascontiguousarray(points.reshape(-1, 3).astype(np.float32))
    colors = np.ascontiguousarray(colors.reshape(-1, 3).astype(np.float32))
    lib = get_lib()
    if lib is None:
        m = mask.astype(bool)
        pts = points[m]
        pts[~np.isfinite(pts)] = 0.0
        return pts, np.clip(colors[m], 0, 255).astype(np.uint8)
    n = mask.shape[0]
    count = lib.atv_count_mask(mask.ctypes.data, n)
    out_pts = np.empty((count, 3), np.float32)
    out_rgb = np.empty((count, 3), np.uint8)
    written = lib.atv_compact_points(
        mask.ctypes.data, points.ctypes.data, colors.ctypes.data, n,
        out_pts.ctypes.data, out_rgb.ctypes.data,
    )
    assert written == count, (written, count)
    return out_pts, out_rgb


def compact_backproject(packed: np.ndarray, depth: np.ndarray,
                        Minv: np.ndarray, P4: np.ndarray):
    """packed (H, W, 4) uint8 [emit, r, g, b] (the fusion chunk's single D2H
    array), depth (H, W) f32 host-resident reference depth, Minv (3,3) / P4 (3,)
    float64 camera geometry -> (m,3) f32 points, (m,3) u8 colors.

    World coordinates are recomputed HERE from the depth map the host already
    holds (X = Minv @ (d*[x,y,1] - P4), fusibile.cu:56-65) instead of being
    transferred from the device — sheds 12 of the 16 D2H bytes/pixel on a
    latency-bound link. Double-precision back-projection; non-finite zeroed."""
    H, W = depth.shape
    packed = np.ascontiguousarray(packed.reshape(H * W, 4).astype(np.uint8, copy=False))
    depth = np.ascontiguousarray(depth.astype(np.float32, copy=False))
    Minv = np.ascontiguousarray(Minv.astype(np.float64, copy=False))
    P4 = np.ascontiguousarray(P4.astype(np.float64, copy=False))
    lib = get_lib()
    if lib is None:
        idx = np.flatnonzero(packed[:, 0])
        d = depth.reshape(-1)[idx].astype(np.float64)
        pt = np.stack([d * (idx % W) - P4[0], d * (idx // W) - P4[1], d - P4[2]], -1)
        pts = (pt @ Minv.T).astype(np.float32)
        pts[~np.isfinite(pts)] = 0.0
        return pts, packed[idx, 1:4].copy()
    count = int(np.count_nonzero(packed[:, 0]))
    out_pts = np.empty((count, 3), np.float32)
    out_rgb = np.empty((count, 3), np.uint8)
    written = lib.atv_compact_backproject(
        packed.ctypes.data, depth.ctypes.data, Minv.ctypes.data, P4.ctypes.data,
        H, W, out_pts.ctypes.data, out_rgb.ctypes.data,
    )
    assert written == count, (written, count)
    return out_pts, out_rgb


def write_ply_native(path: str, points: np.ndarray, colors: np.ndarray) -> bool:
    """Native PLY writer; returns False when unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    points = np.ascontiguousarray(points.astype(np.float32))
    colors = np.ascontiguousarray(colors.astype(np.uint8))
    rc = lib.atv_write_ply(path.encode(), points.ctypes.data, colors.ctypes.data, points.shape[0])
    if rc != 0:
        raise IOError(f"atv_write_ply failed with {rc} for {path}")
    return True
