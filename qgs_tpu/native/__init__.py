"""
Native CPU kernels (ctypes)
===========================

Reference-semantics sparse contraction + RK4 kernels compiled from
``qgs_kernels.cpp`` (the native stand-in for the reference's Numba layer,
which is not installed in this image).  The shared library is built on
first use with the system compiler and cached next to the source; loading
falls back gracefully (``available() -> False``) when no compiler exists.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "qgs_kernels.cpp"
_LIB = _HERE / "libqgs_kernels.so"

_lib = None
_load_error = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC",
           "-o", str(_LIB), str(_SRC)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        c_i64 = ctypes.c_int64
        c_pd = ctypes.POINTER(ctypes.c_double)
        c_pi = ctypes.POINTER(ctypes.c_int64)
        for name, argtypes, restype in [
            ("sparse_mul3", [c_pi, c_pd, c_i64, c_pd, c_pd, c_i64], None),
            ("sparse_mul2", [c_pi, c_pd, c_i64, c_pd, c_pd, c_i64], None),
            ("sparse_mul5", [c_pi, c_pd, c_i64, c_pd, c_pd, c_i64], None),
            ("sparse_mul4", [c_pi, c_pd, c_i64, c_pd, c_pd, c_i64], None),
            ("rk4_integrate3", [c_pi, c_pd, c_i64, c_pd, c_i64,
                                ctypes.c_double, c_i64, c_i64, c_pd], c_i64),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        _lib = lib
    except Exception as exc:  # no compiler / unsupported platform
        _load_error = exc
        _lib = None
    return _lib


def available():
    """Whether the native kernels could be built and loaded."""
    return _load() is not None


def _ptr_d(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _prep_coords(tensor):
    """COO coords as a C-contiguous (nnz, rank) int64 array (entry-major,
    matching the kernels' storage-order accumulation)."""
    return np.ascontiguousarray(tensor.coords.T, dtype=np.int64)


def make_native_tendencies(tensor, jtensor):
    """Native f(t, x) / Df(t, x) closures (reference summation order)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_load_error}")
    rank = tensor.rank
    n1 = tensor.shape[0]
    coords = _prep_coords(tensor)
    data = np.ascontiguousarray(tensor.data, dtype=np.float64)
    jcoords = _prep_coords(jtensor)
    jdata = np.ascontiguousarray(jtensor.data, dtype=np.float64)
    mul_f = lib.sparse_mul3 if rank == 3 else lib.sparse_mul5
    mul_j = lib.sparse_mul2 if rank == 3 else lib.sparse_mul4

    def f(t, x):
        xx = np.concatenate(([1.0], np.asarray(x, np.float64)))
        res = np.empty(n1)
        mul_f(_ptr_i(coords), _ptr_d(data), len(data), _ptr_d(xx),
              _ptr_d(res), n1)
        return res[1:]

    def Df(t, x):
        xx = np.concatenate(([1.0], np.asarray(x, np.float64)))
        res = np.empty((n1, n1))
        mul_j(_ptr_i(jcoords), _ptr_d(jdata), len(jdata), _ptr_d(xx),
              _ptr_d(res), n1)
        return res[1:, 1:]

    return f, Df


def rk4_integrate(tensor, y0, dt, n_steps, write_steps=0):
    """Native single-trajectory RK4 over a rank-3 tensor.

    Returns ``(y_final, recorded)`` with ``recorded`` of shape
    (n_records, ndim) when ``write_steps > 0`` else None."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_load_error}")
    assert tensor.rank == 3
    coords = _prep_coords(tensor)
    data = np.ascontiguousarray(tensor.data, dtype=np.float64)
    y = np.array(y0, dtype=np.float64)
    ndim = y.size
    if write_steps > 0:
        n_rec = n_steps // write_steps + 2
        recorded = np.zeros((n_rec, ndim))
        rec_ptr = _ptr_d(recorded)
    else:
        recorded, rec_ptr = None, _ptr_d(np.zeros(1))
    n_written = lib.rk4_integrate3(_ptr_i(coords), _ptr_d(data), len(data),
                                   _ptr_d(y), ndim, float(dt), n_steps,
                                   write_steps, rec_ptr)
    if write_steps > 0:
        return y, recorded[:n_written]
    return y, None
