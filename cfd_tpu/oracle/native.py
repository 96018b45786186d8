"""ctypes bindings to the native C++ oracle (native/libcfd_oracle.so).

The native library is the independent-language counterpart of the
reference's C/MPI oracle (lanl-implementation/npts.c + test_npts.c) — same
phi/psi algorithm, same role: a second implementation against which the JAX
compute paths are checked. Build with ``make -C native``; everything here
degrades gracefully (``available() -> False``) when the library isn't built.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

__all__ = ["available", "thomas_solve_native", "phi_psi_solve_native", "dfdx_pade4_native"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libcfd_oracle.so",
)


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.cfd_thomas_solve.argtypes = [dp, dp, dp, dp, dp, i64, i64]
    lib.cfd_thomas_solve.restype = ctypes.c_int
    lib.cfd_phi_psi_solve.argtypes = [dp, dp, dp, dp, dp, i64, i64, i64]
    lib.cfd_phi_psi_solve.restype = ctypes.c_int
    lib.cfd_compact_dfdx_pade4.argtypes = [dp, dp, i64, i64, i64, ctypes.c_double]
    lib.cfd_compact_dfdx_pade4.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def thomas_solve_native(dl, d, du, rhs) -> np.ndarray:
    """Thomas solve; rhs shape (n, *batch)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native oracle not built (make -C native)")
    rhs = _c64(rhs)
    n = rhs.shape[0]
    flat = rhs.reshape(n, -1)
    x = np.empty_like(flat)
    rc = lib.cfd_thomas_solve(
        _ptr(_c64(dl)), _ptr(_c64(d)), _ptr(_c64(du)), _ptr(flat), _ptr(x),
        n, flat.shape[1],
    )
    if rc:
        raise RuntimeError(f"cfd_thomas_solve failed: rc={rc}")
    return x.reshape(rhs.shape)


def phi_psi_solve_native(dl, d, du, rhs, nblocks: int) -> np.ndarray:
    """phi/psi block solve; rhs shape (n, *batch)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native oracle not built (make -C native)")
    rhs = _c64(rhs)
    n = rhs.shape[0]
    flat = rhs.reshape(n, -1)
    x = np.empty_like(flat)
    rc = lib.cfd_phi_psi_solve(
        _ptr(_c64(dl)), _ptr(_c64(d)), _ptr(_c64(du)), _ptr(flat), _ptr(x),
        n, flat.shape[1], nblocks,
    )
    if rc:
        raise RuntimeError(f"cfd_phi_psi_solve failed: rc={rc}")
    return x.reshape(rhs.shape)


def dfdx_pade4_native(f, dx: float, nblocks: int = 4) -> np.ndarray:
    """4th-order compact d/dx of lines (n, *batch) via the native oracle."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native oracle not built (make -C native)")
    f = _c64(f)
    n = f.shape[0]
    flat = f.reshape(n, -1)
    x = np.empty_like(flat)
    rc = lib.cfd_compact_dfdx_pade4(
        _ptr(flat), _ptr(x), n, flat.shape[1], nblocks, float(dx)
    )
    if rc:
        raise RuntimeError(f"cfd_compact_dfdx_pade4 failed: rc={rc}")
    return x.reshape(f.shape)
