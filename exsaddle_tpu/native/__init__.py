"""Native (C++) runtime components, bound via ctypes.

The reference's performance-critical host-side stack is native (ILUPACK
F77, METIS/AMD orderings, UMFPACK -- SURVEY.md section 2.3); this package
holds the equivalents: sequential sparse factorizations that belong next
to, not on, the TPU compute path. Libraries are compiled on first use with
the toolchain baked into the image (g++); no pip/pybind11 required."""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIBS = {}


def _load(name):
    if name in _LIBS:
        return _LIBS[name]
    src = os.path.join(_HERE, f"{name}.cpp")
    so = os.path.join(_HERE, f"lib{name}.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, src])
    lib = ctypes.CDLL(so)
    _LIBS[name] = lib
    return lib


_c_long_p = ctypes.POINTER(ctypes.c_long)
_c_dbl_p = ctypes.POINTER(ctypes.c_double)


class ILDLFactor:
    """Incomplete LDL^T of a symmetric matrix given by its upper-triangular
    scipy CSR (diagonal entries present), with drop tolerance."""

    def __init__(self, A_upper_csr, droptol):
        lib = _load("ildl")
        lib.ildl_factor.restype = ctypes.c_int
        A = A_upper_csr.tocsr().sorted_indices()
        n = A.shape[0]
        Ap = np.ascontiguousarray(A.indptr, dtype=np.int64)
        Aj = np.ascontiguousarray(A.indices, dtype=np.int64)
        Ax = np.ascontiguousarray(A.data, dtype=np.float64)
        Lp = _c_long_p()
        Li = _c_long_p()
        Lx = _c_dbl_p()
        D = _c_dbl_p()
        nnz = ctypes.c_long()
        rc = lib.ildl_factor(
            ctypes.c_long(n),
            Ap.ctypes.data_as(_c_long_p), Aj.ctypes.data_as(_c_long_p),
            Ax.ctypes.data_as(_c_dbl_p), ctypes.c_double(droptol),
            ctypes.byref(Lp), ctypes.byref(Li), ctypes.byref(Lx),
            ctypes.byref(D), ctypes.byref(nnz))
        if rc != 0:
            raise RuntimeError("ildl_factor failed")
        self._lib = lib
        self.n = n
        self.nnz = int(nnz.value)          # incl. diagonal
        # copy into numpy and free the C buffers
        ln = np.ctypeslib.as_array(Lp, shape=(n + 1,)).copy()
        lnnz = int(ln[-1])
        self.Lp = ln
        self.Li = np.ctypeslib.as_array(Li, shape=(max(lnnz, 1),)).copy()
        self.Lx = np.ctypeslib.as_array(Lx, shape=(max(lnnz, 1),)).copy()
        self.D = np.ctypeslib.as_array(D, shape=(n,)).copy()
        for p in (Lp, Li, Lx, D):
            lib.ildl_free(p)

    def solve(self, b):
        x = np.array(b, dtype=np.float64, copy=True)
        self._lib.ildl_solve(
            ctypes.c_long(self.n),
            self.Lp.ctypes.data_as(_c_long_p),
            self.Li.ctypes.data_as(_c_long_p),
            self.Lx.ctypes.data_as(_c_dbl_p),
            self.D.ctypes.data_as(_c_dbl_p),
            x.ctypes.data_as(_c_dbl_p))
        return x
