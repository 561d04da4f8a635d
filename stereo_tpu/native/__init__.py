"""Native (C++) runtime components, built on demand and bound via ctypes.

The build mirrors the reference's timestamp-JIT compile.m (compare mtimes of
the shared object vs its sources, rebuild when stale) with g++ instead of mex.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["segment.cpp", "qpbo.cpp", "trws.cpp"]
_LIB_NAME = "libstereo_native.so"
_lock = threading.Lock()
_lib = None


def _needs_build(lib_path: str, sources: list[str]) -> bool:
    if not os.path.exists(lib_path):
        return True
    lib_mtime = os.path.getmtime(lib_path)
    return any(
        os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime
        for s in sources
        if os.path.exists(os.path.join(_DIR, s))
    )


def build(verbose: bool = False) -> str:
    """Compile the native library if stale; returns the .so path."""
    lib_path = os.path.join(_DIR, _LIB_NAME)
    sources = [s for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))]
    if _needs_build(lib_path, sources):
        cmd = (
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", lib_path]
            + [os.path.join(_DIR, s) for s in sources]
        )
        if verbose:
            print("[stereo_tpu.native]", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=not verbose)
    return lib_path


def lib() -> ctypes.CDLL:
    """The loaded native library (built on first use)."""
    global _lib
    with _lock:
        if _lib is None:
            _lib = ctypes.CDLL(build())
            _declare(_lib)
        return _lib


def _declare(L: ctypes.CDLL):
    import ctypes as ct

    u32p = ct.POINTER(ct.c_uint32)
    f32p = ct.POINTER(ct.c_float)
    f64p = ct.POINTER(ct.c_double)
    i32p = ct.POINTER(ct.c_int32)

    L.felzenszwalb.argtypes = [f32p, ct.c_int, ct.c_int, ct.c_float,
                               ct.c_float, ct.c_int, u32p]
    L.felzenszwalb.restype = ct.c_int

    L.connect_modes.argtypes = [f32p, ct.c_int, ct.c_int, ct.c_float,
                                ct.c_int, u32p]
    L.connect_modes.restype = ct.c_int

    if hasattr(L, "trws_serial"):
        L.trws_serial.argtypes = [
            ct.c_int, ct.c_int, ct.c_int, ct.c_int,  # kernel, K, N, E
            f64p, i32p, i32p,  # unary, tails, heads
            f64p, f64p, f64p, ct.c_double,  # q_src, q_dst, alphas, tol
            i32p, ct.c_int, ct.c_double,  # order, maxiter, max_relgap
            i32p, f64p, f64p,  # labels, energy, lb
        ]
        L.trws_serial.restype = ct.c_int

    if hasattr(L, "qpbo_solve"):
        L.qpbo_solve.argtypes = [
            ct.c_int, ct.c_int,  # n_nodes, n_edges
            f64p, f64p,  # U0, U1
            i32p, i32p,  # tails, heads
            f64p, f64p, f64p, f64p,  # E00, E01, E10, E11
            ct.c_int,  # improve
            i32p,  # labels out (-1 unlabelled)
            f64p, f64p, i32p,  # energy, lower bound, n_unlabelled
        ]
        L.qpbo_solve.restype = ct.c_int
