"""Native (C++) runtime components, built on demand and bound via ctypes.

The build mirrors the reference's JIT compile.m (rebuild when stale) with g++
instead of mex.  Staleness is decided by a content hash of the sources plus
the compile command (not mtimes), so a fresh clone — where every mtime equals
checkout time — always triggers a local build and never loads a foreign-host
binary.  The .so itself is gitignored.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["segment.cpp", "qpbo.cpp", "trws.cpp", "interp.cpp"]
_LIB_NAME = "libstereo_native.so"
_HASH_NAME = ".libstereo_native.hash"
# Portable optimization baseline: no -march=native so the binary cannot carry
# host-specific ISA extensions between machines.
_FLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17"]
_lock = threading.Lock()
_lib = None


def _content_hash(sources: list[str]) -> str:
    h = hashlib.sha256()
    h.update(" ".join(_FLAGS).encode())
    for s in sources:
        h.update(s.encode())
        with open(os.path.join(_DIR, s), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _needs_build(lib_path: str, digest: str) -> bool:
    if not os.path.exists(lib_path):
        return True
    hash_path = os.path.join(_DIR, _HASH_NAME)
    if not os.path.exists(hash_path):
        return True
    with open(hash_path) as f:
        return f.read().strip() != digest


def build(verbose: bool = False) -> str:
    """Compile the native library if stale; returns the .so path."""
    lib_path = os.path.join(_DIR, _LIB_NAME)
    sources = [s for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))]
    digest = _content_hash(sources)
    if _needs_build(lib_path, digest):
        # build to a temp path + atomic rename so a concurrent process can
        # never dlopen a half-written .so
        tmp_path = lib_path + f".tmp.{os.getpid()}"
        cmd = (
            ["g++", *_FLAGS, "-o", tmp_path]
            + [os.path.join(_DIR, s) for s in sources]
        )
        if verbose:
            print("[stereo_tpu.native]", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=not verbose)
        os.replace(tmp_path, lib_path)
        with open(os.path.join(_DIR, _HASH_NAME), "w") as f:
            f.write(digest)
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
            f64p, f64p, f64p,  # trace_e, trace_lb, trace_t (nullable)
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
            i32p,  # regions out (nullable)
        ]
        L.qpbo_solve.restype = ct.c_int
