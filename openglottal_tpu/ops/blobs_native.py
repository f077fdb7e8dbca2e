"""ctypes bindings for the native host blob library (native/blobs.cpp).

Same topological semantics as the device kernel (ops/blobs.py); used as the
host-side fast path for mask post-processing outside jit (overlay drawing,
dataset prep) and as a second oracle in tests.  The .so is built on first
use (g++, no external deps) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "libblobs.so"
    if not so.exists() or so.stat().st_mtime < (_NATIVE_DIR / "blobs.cpp").stat().st_mtime:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.og_connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.og_top_n_blobs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.og_masked_percentile_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.og_masked_percentile_u8.restype = ctypes.c_double
    _LIB = lib
    return lib


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def connected_components_host(mask: np.ndarray) -> np.ndarray:
    """8-connected labels (root = min flat index; background = h*w)."""
    lib = _load()
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((h, w), np.int32)
    lib.og_connected_components(
        _u8ptr(m), h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def top_n_blobs_host(mask: np.ndarray, n: int) -> np.ndarray:
    """n largest blobs, FILLED topological semantics. Returns bool mask."""
    lib = _load()
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    lib.og_top_n_blobs(_u8ptr(m), h, w, int(n), _u8ptr(out))
    return out.astype(bool)


def masked_percentile_u8_host(values: np.ndarray, mask: np.ndarray,
                              q: float, fallback: float) -> float:
    lib = _load()
    v = np.ascontiguousarray(values.astype(np.uint8)).ravel()
    m = np.ascontiguousarray(mask.astype(np.uint8)).ravel()
    return float(lib.og_masked_percentile_u8(_u8ptr(v), _u8ptr(m), v.size,
                                             float(q), float(fallback)))
