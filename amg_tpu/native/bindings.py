"""ctypes bindings for the native setup engine (amgcore.cpp).

The shared library is built on demand with g++ (no pip/pybind11 needed) and
cached next to the source. Every entry point has a pure-numpy/scipy fallback
so the framework works even without a toolchain; ``available()`` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "amgcore.cpp")
_SO = os.path.join(_HERE, "libamgcore.so")

_lock = threading.Lock()
_lib = None
_tried = False

_I8 = ctypes.POINTER(ctypes.c_int64)
_F8 = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.amg_spgemm_symbolic.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I8, _I8, _I8, _I8, _I8]
        lib.amg_spgemm_numeric.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I8, _I8, _F8, _I8, _I8, _F8,
            _I8, _I8, _F8]
        lib.amg_csr_transpose.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I8, _I8, _F8, _I8, _I8, _F8]
        lib.amg_greedy_color.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I8, _F8, _I8]
        lib.amg_greedy_color.restype = ctypes.c_int64
        lib.amg_ell_pack.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I8, _I8, _F8, ctypes.c_int64,
            _I8, _F8]
        lib.amg_ell_pack.restype = ctypes.c_int64
        lib.amg_seq_sgs_bench.argtypes = [
            ctypes.c_int64, _I8, _I8, _F8, _F8, _F8, ctypes.c_int64]
        lib.amg_seq_sgs_bench.restype = ctypes.c_double
        PI8 = ctypes.POINTER(_I8)
        PF8 = ctypes.POINTER(_F8)
        lib.amg_cpu_vcycle_solve.argtypes = [
            ctypes.c_int64, PI8, PI8, PF8, _I8, PI8, PI8, PF8, PI8, PI8,
            PF8, _F8, _F8, _F8, ctypes.c_double, ctypes.c_int64,
            ctypes.c_int64, _I8, _F8]
        lib.amg_cpu_vcycle_solve.restype = ctypes.c_double
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p(a, t):
    return a.ctypes.data_as(t)


def _csr_arrays(A):
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int64)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    return indptr, indices, data


def spgemm(A, B):
    """C = A @ B for scipy CSR inputs. Native two-pass SpGEMM; falls back to
    scipy's built-in product."""
    lib = _load()
    if lib is None:
        return (A @ B).tocsr()
    import scipy.sparse as sp

    n, k = A.shape
    k2, m = B.shape
    assert k == k2
    ai, aj, ad = _csr_arrays(A.tocsr())
    bi, bj, bd = _csr_arrays(B.tocsr())
    row_nnz = np.zeros(n, dtype=np.int64)
    lib.amg_spgemm_symbolic(n, m, _p(ai, _I8), _p(aj, _I8), _p(bi, _I8),
                            _p(bj, _I8), _p(row_nnz, _I8))
    c_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_nnz, out=c_indptr[1:])
    nnz = int(c_indptr[-1])
    c_indices = np.zeros(nnz, dtype=np.int64)
    c_data = np.zeros(nnz, dtype=np.float64)
    lib.amg_spgemm_numeric(n, m, _p(ai, _I8), _p(aj, _I8), _p(ad, _F8),
                           _p(bi, _I8), _p(bj, _I8), _p(bd, _F8),
                           _p(c_indptr, _I8), _p(c_indices, _I8),
                           _p(c_data, _F8))
    return sp.csr_matrix((c_data, c_indices, c_indptr), shape=(n, m))


def csr_transpose(A):
    """B = A^T for scipy CSR (native counting transpose)."""
    lib = _load()
    if lib is None:
        return A.T.tocsr()
    import scipy.sparse as sp

    n, m = A.shape
    ai, aj, ad = _csr_arrays(A.tocsr())
    nnz = len(aj)
    b_indptr = np.zeros(m + 1, dtype=np.int64)
    b_indices = np.zeros(nnz, dtype=np.int64)
    b_data = np.zeros(nnz, dtype=np.float64)
    lib.amg_csr_transpose(n, m, _p(ai, _I8), _p(aj, _I8), _p(ad, _F8),
                          _p(b_indptr, _I8), _p(b_indices, _I8),
                          _p(b_data, _F8))
    return sp.csr_matrix((b_data, b_indices, b_indptr), shape=(m, n))


def galerkin_rap(R, A, P):
    """A_H = R (A P) via two native SpGEMMs (multigrid.hpp:219-223)."""
    return spgemm(R, spgemm(A, P))


def greedy_coloring_native(cols, data, n):
    """Native greedy coloring over ELL arrays; returns None if the library
    is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    cols64 = np.ascontiguousarray(cols, dtype=np.int64)
    data64 = np.ascontiguousarray(data, dtype=np.float64)
    K = cols64.shape[1] if cols64.ndim == 2 else 0
    colors = np.zeros(n, dtype=np.int64)
    lib.amg_greedy_color(n, K, _p(cols64, _I8), _p(data64, _F8),
                         _p(colors, _I8))
    return colors


def ell_pack(A, k_max=None):
    """CSR -> (data, cols) padded panels (native). Falls back to the numpy
    path in sparse/ell.py by returning None."""
    lib = _load()
    if lib is None:
        return None
    A = A.tocsr()
    n, m = A.shape
    deg = np.diff(A.indptr)
    K = int(deg.max()) if n else 1
    if k_max is None:
        k_max = max(K, 1)
    ai, aj, ad = _csr_arrays(A)
    cols = np.zeros((n, k_max), dtype=np.int64)
    data = np.zeros((n, k_max), dtype=np.float64)
    ret = lib.amg_ell_pack(n, m, _p(ai, _I8), _p(aj, _I8), _p(ad, _F8),
                           k_max, _p(cols, _I8), _p(data, _F8))
    if ret < 0:
        raise ValueError(f"k_max {k_max} too small; need {-ret}")
    return data, cols


def cpu_vcycle_solve(mats, Ps, Rs, b, tol=1e-9, check_every=5,
                     max_iters=100):
    """Reference-class CPU AMG solve (native): V-cycles with sequential
    symmetric GS smoothing, dense-LU coarsest solve (multigrid.hpp:263-337
    structure). Returns (seconds, iters, rss, u) or None if unavailable.

    mats: list of scipy CSR level matrices (finest first).
    Ps/Rs: lists of scipy CSR transfer operators (len = n_levels - 1).
    """
    lib = _load()
    if lib is None:
        return None
    L = len(mats)
    keep = []  # prevent GC of the contiguous arrays

    def csr_ptrs(ms):
        iptr, idx, dat = [], [], []
        for M in ms:
            ai, aj, ad = _csr_arrays(M.tocsr())
            keep.extend((ai, aj, ad))
            iptr.append(_p(ai, _I8))
            idx.append(_p(aj, _I8))
            dat.append(_p(ad, _F8))
        PI8 = ctypes.POINTER(_I8)
        PF8 = ctypes.POINTER(_F8)
        return ((_I8 * len(ms))(*iptr), (_I8 * len(ms))(*idx),
                (_F8 * len(ms))(*dat))

    a_i, a_j, a_d = csr_ptrs(mats)
    p_i, p_j, p_d = csr_ptrs(Ps)
    r_i, r_j, r_d = csr_ptrs(Rs)
    level_n = np.asarray([M.shape[0] for M in mats], dtype=np.int64)
    lu = np.ascontiguousarray(mats[-1].toarray(), dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    u = np.zeros(mats[0].shape[0], dtype=np.float64)
    iters_out = np.zeros(1, dtype=np.int64)
    rss_out = np.zeros(1, dtype=np.float64)
    secs = lib.amg_cpu_vcycle_solve(
        L, a_i, a_j, a_d, _p(level_n, _I8), p_i, p_j, p_d, r_i, r_j, r_d,
        _p(lu, _F8), _p(b, _F8), _p(u, _F8), tol, check_every, max_iters,
        _p(iters_out, _I8), _p(rss_out, _F8))
    return secs, int(iters_out[0]), float(rss_out[0]), u


def seq_sgs_bench(A, b, iters: int):
    """Time `iters` sequential symmetric GS sweeps (reference smoother
    recurrence) in native code. Returns (seconds, u). None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    A = A.tocsr()
    n = A.shape[0]
    ai, aj, ad = _csr_arrays(A)
    u = np.zeros(n, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    secs = lib.amg_seq_sgs_bench(n, _p(ai, _I8), _p(aj, _I8), _p(ad, _F8),
                                 _p(u, _F8), _p(b, _F8), iters)
    return secs, u
