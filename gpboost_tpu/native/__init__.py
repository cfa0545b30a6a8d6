"""ctypes bindings for the native (C++) runtime components.

The library is built on demand with g++ (native/gpb_native.cpp); every entry
point has a numpy fallback so the package works without a compiler.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "gpb_native.cpp")

_lib = None
_tried = False


def _lib_path():
    """Build artifact keyed on a content hash of the source, so a stale
    binary can never silently serve a newer gpb_native.cpp (the .so itself
    is not committed)."""
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = os.path.join(_REPO_ROOT, "native", "build")
    os.makedirs(build_dir, exist_ok=True)
    return os.path.join(build_dir, f"libgpb_native-{h}.so")


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        path = _lib_path()
        if not os.path.exists(path):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", path, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(path)
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
        lib.gpb_tree_shap.argtypes = [
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.uint8), np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_longlong, ctypes.c_int, np.ctypeslib.ndpointer(np.float64)]
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


def tree_shap(tree, X, phi):
    """Accumulate one tree's exact TreeSHAP attributions into phi (n, p+1).

    Native C++ fast path (gpb_tree_shap); pure-Python fallback implements the
    same Lundberg et al. 2018 algorithm.
    """
    n_nodes = tree.num_nodes
    sf = np.ascontiguousarray(tree.split_feature[:n_nodes], dtype=np.int32)
    thr = np.ascontiguousarray(tree.threshold_real[:n_nodes], dtype=np.float64)
    lc = np.ascontiguousarray(tree.left[:n_nodes], dtype=np.int32)
    rc = np.ascontiguousarray(tree.right[:n_nodes], dtype=np.int32)
    il = np.ascontiguousarray(tree.is_leaf[:n_nodes], dtype=np.uint8)
    lv = np.ascontiguousarray(tree.leaf_value[:n_nodes], dtype=np.float64)
    cov = np.ascontiguousarray(tree.cover[:n_nodes], dtype=np.float64)
    dl = np.ascontiguousarray(tree.default_left[:n_nodes], dtype=np.uint8)
    X = np.ascontiguousarray(X, dtype=np.float64)
    n, p = X.shape
    lib = _load()
    if lib is not None:
        lib.gpb_tree_shap(sf, thr, lc, rc, il, lv, cov, dl, X, n, p, phi)
        return

    # ---------------- pure-Python fallback ----------------
    import sys
    sys.setrecursionlimit(10000)

    def expected(j):
        if il[j]:
            return lv[j]
        return (cov[lc[j]] * expected(lc[j])
                + cov[rc[j]] * expected(rc[j])) / cov[j]

    def extend(path, zf, of, fi):
        path = path + [[fi, zf, of, 1.0 if not path else 0.0]]
        ud = len(path) - 1
        for i in range(ud - 1, -1, -1):
            path[i + 1][3] += of * path[i][3] * (i + 1) / (ud + 1)
            path[i][3] = zf * path[i][3] * (ud - i) / (ud + 1)
        return path

    def unwind(path, pi):
        ud = len(path) - 1
        of, zf = path[pi][2], path[pi][1]
        next_one = path[ud][3]
        path = [list(e) for e in path]
        for i in range(ud - 1, -1, -1):
            if of != 0:
                tmp = path[i][3]
                path[i][3] = next_one * (ud + 1) / ((i + 1) * of)
                next_one = tmp - path[i][3] * zf * (ud - i) / (ud + 1)
            else:
                path[i][3] = path[i][3] * (ud + 1) / (zf * (ud - i))
        for i in range(pi, ud):
            path[i][:3] = path[i + 1][:3]
        return path[:-1]

    def unwound_sum(path, pi):
        ud = len(path) - 1
        of, zf = path[pi][2], path[pi][1]
        next_one = path[ud][3]
        total = 0.0
        for i in range(ud - 1, -1, -1):
            if of != 0:
                tmp = next_one * (ud + 1) / ((i + 1) * of)
                total += tmp
                next_one = path[i][3] - tmp * zf * (ud - i) / (ud + 1)
            else:
                total += path[i][3] / zf / ((ud - i) / (ud + 1))
        return total

    def recurse(j, x, phi_row, path, pzf, pof, pfi):
        path = extend([list(e) for e in path], pzf, pof, pfi)
        if il[j]:
            ud = len(path) - 1
            for i in range(1, ud + 1):
                w = unwound_sum(path, i)
                phi_row[path[i][0]] += w * (path[i][2] - path[i][1]) * lv[j]
            return
        f = sf[j]
        xv = x[f]
        go_left = (xv <= thr[j]) if np.isfinite(xv) else bool(dl[j])
        hot, cold = (lc[j], rc[j]) if go_left else (rc[j], lc[j])
        hzf, czf = cov[hot] / cov[j], cov[cold] / cov[j]
        izf = iof = 1.0
        pi = next((i for i, e in enumerate(path) if e[0] == f), None)
        if pi is not None:
            izf, iof = path[pi][1], path[pi][2]
            path = unwind(path, pi)
        recurse(hot, x, phi_row, path, hzf * izf, iof, f)
        recurse(cold, x, phi_row, path, czf * izf, 0.0, f)

    ev = expected(0)
    for i in range(n):
        phi[i, p] += ev
        recurse(0, X[i], phi[i], [], 1.0, 1.0, -1)
