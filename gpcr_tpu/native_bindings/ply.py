"""ctypes binding for the native PLY parser (native/ply_parser.cpp)."""

from __future__ import annotations

import ctypes
import typing as T

import numpy as np

from . import _build_lib

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            lib = ctypes.CDLL(_build_lib("gpcr_ply", ["ply_parser.cpp"]))
            lib.ply_count.restype = ctypes.c_long
            lib.ply_count.argtypes = [ctypes.c_char_p]
            lib.ply_read.restype = ctypes.c_int
            lib.ply_read.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def read_ply(path: str) -> T.Optional[dict]:
    """Fast binary-PLY read; returns None if the native path can't handle
    the file (ascii, lists, missing lib) — caller falls back to python."""
    lib = _lib()
    if lib is None:
        return None
    n = lib.ply_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    normal = np.empty((n, 3), np.float32)
    has_rgb = ctypes.c_int(0)
    has_normal = ctypes.c_int(0)
    rc = lib.ply_read(
        path.encode(), n,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        normal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(has_rgb), ctypes.byref(has_normal),
    )
    if rc != 0:
        return None
    out = {"xyz": xyz}
    if has_rgb.value:
        out["rgb"] = rgb
    if has_normal.value:
        out["normal"] = normal
    return out
