"""Loader for the native host library (native/fast_splats.cpp).

Builds the shared library on demand with the system C++ compiler (cached next
to the source keyed by mtime) and exposes its entry points through ctypes.
Everything degrades gracefully to the numpy implementations when no compiler
is available — call sites check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "fast_splats.cpp")
_LIB_PATH = _SRC.replace(".cpp", ".so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    for cxx in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            continue
    return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.fast_ply_extract.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.fast_ply_extract_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p]
        lib.radix_argsort_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.fast_ply_extract_3dgs.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64] + \
            [ctypes.c_void_p] * 6
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def ply_extract(payload: np.ndarray, n_rows: int, stride: int,
                offsets: list[int]) -> list[np.ndarray]:
    """Gather f32 columns at byte `offsets` from a packed record buffer."""
    lib = _load()
    assert lib is not None
    outs = [np.empty(n_rows, np.float32) for _ in offsets]
    off = (ctypes.c_int64 * len(offsets))(*offsets)
    ptrs = (ctypes.c_void_p * len(offsets))(
        *[o.ctypes.data for o in outs])
    lib.fast_ply_extract(payload.ctypes.data, n_rows, stride, off,
                         len(offsets), ptrs)
    return outs


def ply_extract_block(payload: np.ndarray, n_rows: int, stride: int,
                      base_offset: int, n_cols: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty((n_rows, n_cols), np.float32)
    lib.fast_ply_extract_block(payload.ctypes.data, n_rows, stride,
                               base_offset, n_cols, out.ctypes.data)
    return out


def ply_extract_3dgs(payload: np.ndarray, n: int, stride: int,
                     offsets: list[int], m: int):
    """Single-pass extraction of the full 3DGS layout incl. SH repack.
    offsets: 15 byte offsets [x,y,z,fdc*3,opacity,scale*3,rot*4,f_rest_0]
    with -1 for absent groups."""
    lib = _load()
    assert lib is not None and len(offsets) == 15
    means = np.empty((n, 3), np.float32)
    sh_dc = np.zeros((n, 3), np.float32)
    opacity = np.zeros(n, np.float32)
    scales = np.full((n, 3), -8.0, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    sh_rest = np.empty((n, m, 3), np.float32) if m else \
        np.zeros((n, 0, 3), np.float32)
    off = (ctypes.c_int64 * 15)(*offsets)
    lib.fast_ply_extract_3dgs(
        payload.ctypes.data, n, stride, off, m,
        means.ctypes.data, sh_dc.ctypes.data, opacity.ctypes.data,
        scales.ctypes.data, quats.ctypes.data, sh_rest.ctypes.data)
    return means, sh_dc, opacity, scales, quats, sh_rest


def radix_argsort_f32(values: np.ndarray) -> np.ndarray:
    """Stable ascending argsort (vrdx-style 4x8-bit LSD radix)."""
    lib = _load()
    assert lib is not None
    values = np.ascontiguousarray(values, np.float32)
    order = np.empty(values.shape[0], np.int32)
    lib.radix_argsort_f32(values.ctypes.data, values.shape[0],
                          order.ctypes.data)
    return order
