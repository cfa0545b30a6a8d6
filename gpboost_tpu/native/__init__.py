"""ctypes bindings for the native (C++) runtime components.

The library is built on demand with g++ (native/gpb_native.cpp); every entry
point has a numpy fallback so the package works without a compiler.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "gpb_native.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libgpb_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gpb_read_csv.restype = ctypes.c_int
        lib.gpb_read_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_char, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int)]
        lib.gpb_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.gpb_bin_column.argtypes = [
            np.ctypeslib.ndpointer(np.float64), ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.float64), ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32)]
        lib.gpb_nn_preceding_2d.argtypes = [
            np.ctypeslib.ndpointer(np.float64), ctypes.c_longlong,
            ctypes.c_int, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.uint8)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return _load() is not None


def read_csv(path, sep=",", has_header=True):
    """Read a numeric CSV into a (n, p) float64 array (native fast path;
    numpy fallback)."""
    lib = _load()
    if lib is None:
        return np.genfromtxt(path, delimiter=sep,
                             skip_header=1 if has_header else 0)
    out = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_longlong()
    p = ctypes.c_int()
    rc = lib.gpb_read_csv(path.encode(), sep.encode(),
                          1 if has_header else 0,
                          ctypes.byref(out), ctypes.byref(n), ctypes.byref(p))
    if rc != 0:
        raise IOError(f"gpb_read_csv failed with code {rc} for {path}")
    arr = np.ctypeslib.as_array(out, shape=(n.value, p.value)).copy()
    lib.gpb_free(out)
    return arr


def bin_column(values, upper_bounds, nan_bin=-1):
    """Quantize one feature column against its bin upper bounds."""
    lib = _load()
    values = np.ascontiguousarray(values, dtype=np.float64)
    uppers = np.ascontiguousarray(upper_bounds, dtype=np.float64)
    if lib is None:
        bins = np.searchsorted(uppers[:-1], values, side="left").astype(np.int32)
        if nan_bin >= 0:
            bins = np.where(np.isfinite(values), bins, nan_bin).astype(np.int32)
        return bins
    out = np.empty(len(values), dtype=np.int32)
    lib.gpb_bin_column(values, len(values), uppers, len(uppers), nan_bin, out)
    return out


def nn_preceding_2d(coords, m):
    """Nearest preceding neighbors for 2-D coords (Vecchia) — native
    cell-bucketed search; returns (idx (n, m) int64, mask (n, m) bool)."""
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    n = len(coords)
    idx = np.empty((n, m), dtype=np.int64)
    mask = np.empty((n, m), dtype=np.uint8)
    lib.gpb_nn_preceding_2d(coords, n, m, idx, mask)
    return idx, mask.astype(bool)
