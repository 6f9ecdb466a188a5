"""ctypes bindings for the native host runtime (sctl_native.cpp).

Builds the shared library on first use (g++, OpenMP); every entry point
has a numpy fallback so the framework works without a toolchain — the
reference's "always-works fallback" discipline (SURVEY.md §5.6).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libsctl_native.so")
_SRC = os.path.join(_HERE, "sctl_native.cpp")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
             "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.morton_encode_3d.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint64)]
        lib.morton_encode_2d.argtypes = lib.morton_encode_3d.argtypes
        lib.sort_keys_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.box_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.sort_small_keys.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def morton_encode(coords: np.ndarray, depth: int) -> np.ndarray:
    """Parallel Morton keys for (n, dim) coords in [0,1)."""
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    n, dim = coords.shape
    lib = get_lib()
    if lib is None:
        from ..tree import morton as mt
        D = mt.max_depth(dim)
        keys = mt.morton_encode(coords, dim=dim)
        shift = np.uint64(dim * (D - depth))
        return (keys >> shift) << shift
    out = np.empty(n, dtype=np.uint64)
    fn = lib.morton_encode_3d if dim == 3 else lib.morton_encode_2d
    fn(_ptr(coords, ctypes.c_double), n, depth,
       _ptr(out, ctypes.c_uint64))
    return out


def argsort_u64(keys: np.ndarray):
    """Parallel radix sort; returns (sorted_keys, perm)."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64).copy()
    n = len(keys)
    lib = get_lib()
    if lib is None:
        perm = np.argsort(keys, kind="stable")
        return keys[perm], perm
    perm = np.empty(n, dtype=np.int64)
    lib.sort_keys_u64(_ptr(keys, ctypes.c_uint64),
                      _ptr(perm, ctypes.c_int64), n)
    return keys, perm


def argsort_small(keys: np.ndarray, key_bits: int):
    """Sort int64 keys < 2^key_bits (key_bits <= 24) carrying indices;
    returns (sorted_keys, perm).  The tree-construction fast path."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = len(keys)
    lib = get_lib()
    if lib is None or key_bits > 24 or n >= (1 << 40):
        perm = np.argsort(keys, kind="stable")
        return keys[perm], perm
    perm = np.empty(n, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    lib.sort_small_keys(_ptr(keys, ctypes.c_int64), n, key_bits,
                        _ptr(perm, ctypes.c_int64),
                        _ptr(out, ctypes.c_int64))
    return out, perm


def box_counts(sorted_box_ids: np.ndarray, n_boxes: int) -> np.ndarray:
    ids = np.ascontiguousarray(sorted_box_ids, dtype=np.int64)
    lib = get_lib()
    if lib is None:
        return np.bincount(ids, minlength=n_boxes)[:n_boxes]
    out = np.empty(n_boxes, dtype=np.int64)
    lib.box_counts(_ptr(ids, ctypes.c_int64), len(ids), n_boxes,
                   _ptr(out, ctypes.c_int64))
    return out
