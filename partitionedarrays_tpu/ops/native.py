"""ctypes loader for the native C++ setup kernels (native/native.cpp).

Compiled lazily with g++ on first use; every entry point has a numpy/scipy
fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None  # None = not tried; False = unavailable

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libpatnative.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is False:
        return None
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            I64 = ctypes.POINTER(ctypes.c_int64)
            F64 = ctypes.POINTER(ctypes.c_double)
            I32 = ctypes.POINTER(ctypes.c_int32)
            lib.coo_to_csr.restype = ctypes.c_int64
            lib.coo_to_csr.argtypes = [I64, I64, F64, ctypes.c_int64,
                                       ctypes.c_int64, I64, I64, F64]
            lib.greedy_coloring.restype = ctypes.c_int64
            lib.greedy_coloring.argtypes = [I64, I64, ctypes.c_int64, I32]
            lib.vanek_aggregate.restype = ctypes.c_int64
            lib.vanek_aggregate.argtypes = [I64, I64, F64, ctypes.c_int64,
                                            ctypes.c_double, I64]
            lib.ilu0.restype = ctypes.c_int64
            lib.ilu0.argtypes = [I64, I64, F64, ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = False
            return None
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def coo_to_csr_native(I, J, V, m: int, n: int):
    """COO -> scipy CSR with duplicates summed; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    import scipy.sparse as sp

    I = np.ascontiguousarray(I, dtype=np.int64)
    J = np.ascontiguousarray(J, dtype=np.int64)
    V = np.ascontiguousarray(V, dtype=np.float64)
    nnz = I.size
    indptr = np.zeros(m + 1, dtype=np.int64)
    indices = np.zeros(max(nnz, 1), dtype=np.int64)
    data = np.zeros(max(nnz, 1), dtype=np.float64)
    w = lib.coo_to_csr(
        _ptr(I, ctypes.c_int64), _ptr(J, ctypes.c_int64), _ptr(V, ctypes.c_double),
        nnz, m,
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double),
    )
    return sp.csr_matrix(
        (data[:w], indices[:w].astype(np.int32, copy=False), indptr), shape=(m, n)
    )


def greedy_coloring_native(A) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    S = (A + A.T).tocsr()
    n = S.shape[0]
    indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S.indices, dtype=np.int64)
    colors = np.zeros(n, dtype=np.int32)
    lib.greedy_coloring(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64), n,
        _ptr(colors, ctypes.c_int32),
    )
    return colors


def vanek_aggregate_native(A, eps: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    A = A.tocsr()
    n = A.shape[0]
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int64)
    data = np.ascontiguousarray(A.data, dtype=np.float64)
    agg = np.zeros(n, dtype=np.int64)
    lib.vanek_aggregate(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
        _ptr(data, ctypes.c_double), n, float(eps), _ptr(agg, ctypes.c_int64),
    )
    return agg


def ilu0(A):
    """ILU(0) of a square CSR matrix (zero fill): returns (L, U) with L
    unit-lower (unit diagonal stored explicitly) and U upper triangular,
    both canonical CSR with exactly A's lower/upper patterns — the
    classic combined-storage IKJ factorization.  Native C++ with a
    python fallback.  The factorization perturbs zero/tiny pivots
    instead of failing (it is a PRECONDITIONER factor)."""
    import scipy.sparse as sp

    A = A.tocsr()
    if not A.has_sorted_indices:
        A = A.copy()
        A.sort_indices()
    n = A.shape[0]
    # ensure a structural diagonal (ILU(0) requires it): add explicit
    # zeros where the pattern lacks (i, i)
    rows_all = np.repeat(np.arange(n), np.diff(A.indptr))
    diag_missing = np.setdiff1d(
        np.arange(n), A.indices[rows_all == A.indices], assume_unique=False
    )
    if diag_missing.size:
        A = (A + sp.csr_matrix(
            (np.zeros(diag_missing.size), (diag_missing, diag_missing)),
            shape=A.shape,
        )).tocsr()
        A.sort_indices()
    indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A.indices, dtype=np.int64)
    data = np.ascontiguousarray(A.data, dtype=np.float64).copy()
    lib = _load()
    if lib is not None:
        rc = lib.ilu0(
            _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
            _ptr(data, ctypes.c_double), n,
        )
        if rc < 0:
            raise ValueError("ilu0: structurally missing diagonal")
    else:
        _ilu0_python(indptr, indices, data, n)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    lower = rows > indices
    upper = ~lower
    L = sp.csr_matrix(
        (
            np.concatenate([data[lower], np.ones(n)]),
            (
                np.concatenate([rows[lower], np.arange(n)]),
                np.concatenate([indices[lower], np.arange(n)]),
            ),
        ),
        shape=A.shape,
    )
    U = sp.csr_matrix((data[upper], (rows[upper], indices[upper])), shape=A.shape)
    L.sort_indices()
    U.sort_indices()
    return L, U


def _ilu0_python(indptr, indices, data, n):
    """Pure-python IKJ fallback (slow; only without a C++ toolchain)."""
    pos = np.full(n, -1, dtype=np.int64)
    diagpos = np.full(n, -1, dtype=np.int64)
    scale = np.abs(data).mean() if data.size else 1.0
    tiny = 1e-12 * max(scale, 1e-300)
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        for p in range(lo, hi):
            pos[indices[p]] = p
            if indices[p] == i:
                diagpos[i] = p
        for p in range(lo, hi):
            k = indices[p]
            if k >= i:
                break
            dk = diagpos[k]
            data[p] /= data[dk]
            lik = data[p]
            for q in range(dk + 1, indptr[k + 1]):
                pp = pos[indices[q]]
                if pp >= 0:
                    data[pp] -= lik * data[q]
        if diagpos[i] < 0:
            raise ValueError("ilu0: structurally missing diagonal")
        if abs(data[diagpos[i]]) < tiny:
            data[diagpos[i]] = tiny if data[diagpos[i]] >= 0 else -tiny
        pos[indices[lo:hi]] = -1
