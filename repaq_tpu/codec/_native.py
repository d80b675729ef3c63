"""ctypes bindings for the native (C++) host kernels.

The sequential byte-stream scans (token boundary detection) are the one
part of the codec that resists vectorization on the host; librepaq_native
provides them at memory speed. Falls back gracefully when the library has
not been built (pure-numpy/Python paths take over).

Build: ``make -C repaq_tpu/native`` (see repaq_tpu/native/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "librepaq_native.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.token_starts.restype = ctypes.c_int64
    lib.token_starts.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def token_starts(lens: np.ndarray) -> np.ndarray:
    lib = _load()
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    out = np.empty(lens.shape[0], dtype=np.int64)
    n = lib.token_starts(
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
