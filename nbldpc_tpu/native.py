"""ctypes binding for the native host library (native/nbldpc_host.cpp).

The reference genre's host-side core (GF tables, parity-matrix Gaussian
elimination, PEG graph BFS) is C++; this module loads the framework's native
equivalent, building it with g++ on first use (cached in build/). Every entry
point has a byte-identical numpy fallback in gf.py/encode.py/codegen.py —
`available()` gates usage, and NBLDPC_NATIVE=0 disables it.

pybind11 is not in this image; the library exposes a plain C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[1]
_SRC = _REPO / "native" / "nbldpc_host.cpp"
_BUILD = _REPO / "build"
_LIB = _BUILD / "libnbldpc_host.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    _BUILD.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("NBLDPC_NATIVE", "1") == "0":
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.nb_gf_tables.argtypes = [ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, i32p]
    lib.nb_gf_tables.restype = ctypes.c_int
    lib.nb_gf_row_reduce.argtypes = [
        ctypes.c_int, ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p, i32p
    ]
    lib.nb_gf_row_reduce.restype = ctypes.c_int
    lib.nb_peg_bfs.argtypes = [
        ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, i32p, ctypes.c_int, i32p
    ]
    lib.nb_peg_bfs.restype = None
    lib.nb_syndrome.argtypes = [
        ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, i32p, i32p, i32p
    ]
    lib.nb_syndrome.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---- typed wrappers --------------------------------------------------------


def gf_tables(q: int, poly: int):
    """exp [2(q-1)], log [q], inv [q], mul [q, q] — or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    exp = np.zeros(2 * (q - 1), np.int32)
    log = np.zeros(q, np.int32)
    inv = np.zeros(q, np.int32)
    mul = np.zeros(q * q, np.int32)
    if lib.nb_gf_tables(q, poly, exp, log, inv, mul) != 0:
        raise ValueError(f"poly {poly:#b} not primitive for q={q}")
    return exp, log, inv, mul.reshape(q, q)


def gf_row_reduce(H: np.ndarray, q: int, mul: np.ndarray, inv: np.ndarray):
    """Native GE with the same pivoting as encode.gf_row_reduce.
    Returns (R, rank, pivot_cols) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    R = np.ascontiguousarray(H, dtype=np.int32).copy()
    m, n = R.shape
    piv = np.zeros(m, np.int32)
    mul_f = np.ascontiguousarray(mul, dtype=np.int32).reshape(-1)
    inv_c = np.ascontiguousarray(inv, dtype=np.int32)
    rank = lib.nb_gf_row_reduce(q, m, n, R.reshape(-1), mul_f, inv_c, piv)
    return R, int(rank), piv[:rank].copy()


def peg_bfs(vn_ptr, vn_adj, cn_ptr, cn_adj, n: int, m: int, v: int):
    """Check-node distances from variable v; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dist = np.zeros(m, np.int32)
    lib.nb_peg_bfs(
        n, m,
        np.ascontiguousarray(vn_ptr, np.int32),
        np.ascontiguousarray(vn_adj, np.int32),
        np.ascontiguousarray(cn_ptr, np.int32),
        np.ascontiguousarray(cn_adj, np.int32),
        v, dist,
    )
    return dist.astype(np.int64)
