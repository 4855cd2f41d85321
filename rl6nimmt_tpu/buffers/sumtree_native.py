"""ctypes binding for the native replay-sampling kernels (native/sumtree.cpp).

Auto-builds the shared object on first import when a compiler is available;
importing this module raises if the library can't be produced, and
:mod:`rl6nimmt_tpu.buffers.host` falls back to NumPy transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_rl6_sumtree.so")
_SRC_DIR = os.path.join(_HERE, os.pardir, os.pardir, "native")


def _build() -> None:
    subprocess.run(
        ["make", "-C", _SRC_DIR],
        check=True,
        capture_output=True,
    )


if not os.path.exists(_SO_PATH):
    _build()

_lib = ctypes.CDLL(_SO_PATH)

_lib.rl6_stratified_sample.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64),
]
_lib.rl6_update_priorities.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ctypes.c_double, ctypes.c_double, ctypes.c_double,
]
_lib.rl6_max_priority.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
_lib.rl6_max_priority.restype = ctypes.c_double


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def stratified_sample(priorities: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Leaf indices for ascending stratified draws ``u`` over ``priorities``."""
    pri = np.ascontiguousarray(priorities, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    out = np.empty(u.shape[0], dtype=np.int64)
    _lib.rl6_stratified_sample(_dptr(pri), pri.shape[0], _dptr(u), u.shape[0], _iptr(out))
    return out


def update_priorities(
    priorities: np.ndarray,
    idx: np.ndarray,
    abs_errors: np.ndarray,
    eps: float,
    cap: float,
    alpha: float,
) -> None:
    """In-place clipped-power priority writeback (priorities must be f64 C-contiguous)."""
    assert priorities.dtype == np.float64 and priorities.flags.c_contiguous
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    err = np.ascontiguousarray(abs_errors, dtype=np.float64)
    _lib.rl6_update_priorities(
        _dptr(priorities), _iptr(idx), _dptr(err), idx.shape[0], eps, cap, alpha
    )


def max_priority(priorities: np.ndarray, n: int) -> float:
    pri = np.ascontiguousarray(priorities, dtype=np.float64)
    return float(_lib.rl6_max_priority(_dptr(pri), n))
