"""ctypes bindings for the native host-side data generator (cpp/synthgen.cpp).

Builds lazily with `make -C cpp` on first use if the shared library is
missing; falls back to the numpy implementation if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    cpp_dir = os.path.join(_repo_root(), "cpp")
    so = os.path.join(cpp_dir, "libsynthgen.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", cpp_dir], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.synthgen_textures.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.synthgen_warp.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    if hasattr(lib, "synthgen_textures_mixed"):  # older .so builds lack it
        lib.synthgen_textures_mixed.argtypes = lib.synthgen_textures.argtypes
    _LIB = lib
    return lib


def native_textures(batch: int, h: int, w: int, seed: int,
                    n_blobs: int = 60) -> Optional[np.ndarray]:
    """[batch, h, w] float32 textures, or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((batch, h, w), np.float32)
    lib.synthgen_textures(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        batch, h, w, seed & 0xFFFFFFFFFFFFFFFF, n_blobs)
    return out


def native_textures_mixed(batch: int, h: int, w: int, seed: int,
                          n_blobs: int = 60) -> Optional[np.ndarray]:
    """Mixed-family training bank (structured / dead-leaves / fBm by
    index % 3); None if the library is unavailable or predates the export."""
    lib = load_library()
    if lib is None or not hasattr(lib, "synthgen_textures_mixed"):
        return None
    out = np.empty((batch, h, w), np.float32)
    lib.synthgen_textures_mixed(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        batch, h, w, seed & 0xFFFFFFFFFFFFFFFF, n_blobs)
    return out


def native_warp(src: np.ndarray, H: np.ndarray) -> Optional[np.ndarray]:
    """Warp [B, h, w] images by per-sample homographies [B, 3, 3]
    (cv2.warpPerspective convention: dst(p) = src(H^-1 p))."""
    lib = load_library()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    b, h, w = src.shape
    Hinv = np.ascontiguousarray(
        np.linalg.inv(np.asarray(H, np.float64)), np.float64)
    dst = np.empty_like(src)
    lib.synthgen_warp(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        Hinv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b, h, w)
    return dst
