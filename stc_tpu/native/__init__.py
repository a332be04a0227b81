"""Native host runtime: ctypes bindings for the C++ frame preprocessor.

Builds the shared library lazily with g++ (no pybind11 in this image); all
call sites fall back to the pure-JAX path when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "frameproc.cpp")


def _so_path() -> str:
    """Binary path keyed by a content hash of the source: a checkout can
    never load a binary that drifted from frameproc.cpp (binaries are not
    committed; see .gitignore)."""
    import hashlib
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"libframeproc-{h}.so")


_lib = None
_tried = False


def _build(so: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", so],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    _SO = _so_path()
    if not os.path.exists(_SO):
        if not _build(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.stc_preprocess_frames.restype = ctypes.c_int
        lib.stc_preprocess_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.stc_rgb_to_yuv420.restype = ctypes.c_int
        lib.stc_rgb_to_yuv420.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def preprocess_frames(frames: np.ndarray, out_hw: int, mean, std,
                      n_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """(n, h, w, 3) uint8 -> (n, 3, out_hw, out_hw) float32 normalized CHW.

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3, frames.shape
    out = np.empty((n, 3, out_hw, out_hw), dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    rc = lib.stc_preprocess_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_hw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n_threads))
    if rc != 0:
        return None
    return out


def _rgb_to_yuv420_np(frames: np.ndarray) -> np.ndarray:
    """Pure-numpy mirror of stc_rgb_to_yuv420 — BIT-IDENTICAL output (same
    x256 fixed-point coefficients and rounding)."""
    n, h, w, _ = frames.shape
    f = frames.astype(np.int32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    u = (-43 * r - 85 * g + 128 * b + 32768 + 128) >> 8
    v = (128 * r - 107 * g - 21 * b + 32768 + 128) >> 8
    # 2x2 chroma average (sum of the four per-pixel values, +2 rounding)
    def sub(c):
        c = c.reshape(n, h // 2, 2, w // 2, 2)
        return (c.sum(axis=(2, 4)) + 2) >> 2
    out = np.concatenate(
        [y.reshape(n, -1), sub(u).reshape(n, -1), sub(v).reshape(n, -1)],
        axis=1).astype(np.uint8)
    return out


def rgb_to_yuv420(frames: np.ndarray,
                  n_threads: Optional[int] = None) -> np.ndarray:
    """(n, h, w, 3) uint8 RGB -> (n, h*w*3//2) uint8 packed planar YUV420
    (BT.601 full range, 2x2 chroma average): HALF the host->device bytes of
    raw RGB.  Production video is stored 4:2:0 — a decoder hands these
    planes over for free; this converter exists for RGB sources (tests,
    synthetic benches, webcams).  Native C++ when available, bit-identical
    numpy otherwise; h and w must be even."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, frames.shape
    lib = get_lib()
    if lib is None:
        return _rgb_to_yuv420_np(frames)
    out = np.empty((n, h * w * 3 // 2), dtype=np.uint8)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    rc = lib.stc_rgb_to_yuv420(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_threads))
    if rc != 0:
        return _rgb_to_yuv420_np(frames)
    return out
