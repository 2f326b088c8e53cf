"""Native (C) host-side runtime components.

The reference implements its host-side numeric utilities in C
(SURVEY.md §2.1-2.3); the TPU compute path here is XLA/Pallas, and the
host-side pieces that benefit from native code live in this package,
compiled on demand with the system toolchain and loaded via ctypes
(pybind11 is not available in the build image), with pure-Python
fallbacks when no compiler is present.

Currently: `mindeg_order` — minimum-degree fill-reducing ordering
(the amd.c analogue) used by ops.spsolve.amd_order for large patterns.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_mindeg.so")
_lib = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "mindeg.c")
    try:
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if no
    toolchain is available."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mindeg_order.restype = ctypes.c_int
        lib.mindeg_order.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def mindeg_order(indptr, indices, n: int) -> Optional[np.ndarray]:
    """Native minimum-degree ordering of a CSR symmetric pattern;
    returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.zeros(n, dtype=np.int32)
    rc = lib.mindeg_order(n, indptr, indices, perm)
    if rc != 0:
        return None
    return perm


# ---- blockfill (symbolic block-Cholesky fill, blockfill.c) -----------

_BF_PATH = os.path.join(_HERE, "_blockfill.so")
_bf_lib = None
_bf_tried = False


def _bf_get():
    global _bf_lib, _bf_tried
    if _bf_lib is not None or _bf_tried:
        return _bf_lib
    _bf_tried = True
    path = _BF_PATH
    if not os.path.exists(path):
        src = os.path.join(_HERE, "blockfill.c")
        try:
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", path, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.block_fill.restype = ctypes.c_long
        lib.block_fill.argtypes = [
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
        _bf_lib = lib
    except Exception:
        _bf_lib = None
    return _bf_lib


def block_fill(indptr, indices, nt: int):
    """Native symbolic block-Cholesky fill (blockfill.c): CSR block
    adjacency -> (colptr, cols) of the factor's block pattern
    (diagonal first per column).  None when unavailable."""
    lib = _bf_get()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    cap = max(64 * nt, int(indices.size) * 4 + nt)
    for _ in range(4):
        colptr = np.zeros(nt + 1, dtype=np.int64)
        cols = np.zeros(cap, dtype=np.int64)
        rc = lib.block_fill(nt, indptr, indices, colptr, cols, cap)
        if rc == -1:
            cap *= 4
            continue
        if rc < 0:
            return None
        return colptr, cols[:rc]
    return None
