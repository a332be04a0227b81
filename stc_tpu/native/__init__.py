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
