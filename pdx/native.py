"""ctypes bindings for the native C++ host-ops library (csrc/hostops.cpp).

Compiled on demand with g++ (cached in ~/.cache/pdx_native). The library is
the framework's host-native layer — independent implementations of the warp,
blur, blockwise, and STRidge primitives used as parity oracles in tests and
as a NumPy-only fallback path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_SRC = Path(__file__).resolve().parents[1] / "csrc" / "hostops.cpp"


def _build() -> Path | None:
    if not _SRC.exists():
        return None
    cache = Path(os.environ.get("PDX_NATIVE_CACHE", os.path.expanduser("~/.cache/pdx_native")))
    cache.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = cache / f"hostops_{tag}.so"
    if so.exists():
        return so
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so if so.exists() else None


def get_lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    d = ctypes.POINTER(ctypes.c_double)
    lib.shift_periodic_f64.argtypes = [d, d, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.shift_reflect_f64.argtypes = [d, d, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.gaussian_blur_reflect_f64.argtypes = [d, d, ctypes.c_int, ctypes.c_int, ctypes.c_double]
    lib.blockwise_mean_f64.argtypes = [d, d] + [ctypes.c_int] * 7 + [d, d]
    lib.blockwise_mean_f64.restype = ctypes.c_int
    lib.stridge_f64.argtypes = [d, d, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int, d]
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def shift_periodic(frame: np.ndarray, sx: float, sy: float) -> np.ndarray:
    lib = get_lib()
    f = np.ascontiguousarray(frame, dtype=np.float64)
    out = np.empty_like(f)
    lib.shift_periodic_f64(_ptr(f), _ptr(out), f.shape[0], f.shape[1], sx, sy)
    return out


def shift_reflect(frame: np.ndarray, sx: float, sy: float) -> np.ndarray:
    lib = get_lib()
    f = np.ascontiguousarray(frame, dtype=np.float64)
    out = np.empty_like(f)
    lib.shift_reflect_f64(_ptr(f), _ptr(out), f.shape[0], f.shape[1], sx, sy)
    return out


def gaussian_blur_reflect(frame: np.ndarray, sigma: float) -> np.ndarray:
    lib = get_lib()
    f = np.ascontiguousarray(frame, dtype=np.float64)
    out = np.empty_like(f)
    lib.gaussian_blur_reflect_f64(_ptr(f), _ptr(out), f.shape[0], f.shape[1], sigma)
    return out


def blockwise_mean(yfield: np.ndarray, terms: np.ndarray, bt: int, bx: int, by: int):
    lib = get_lib()
    y = np.ascontiguousarray(yfield, dtype=np.float64)
    t = np.ascontiguousarray(terms, dtype=np.float64)
    p, T, H, W = t.shape
    nbt = -(-T // bt)
    nbx = -(-H // bx)
    nby = -(-W // by)
    n_blocks = nbt * nbx * nby
    X = np.empty((n_blocks, p), dtype=np.float64)
    yo = np.empty(n_blocks, dtype=np.float64)
    nb = lib.blockwise_mean_f64(_ptr(y), _ptr(t), p, T, H, W, bt, bx, by, _ptr(X), _ptr(yo))
    return X[:nb], yo[:nb]


def stridge(X: np.ndarray, y: np.ndarray, alpha: float = 1e-3, threshold: float = 1e-6, max_iter: int = 25) -> np.ndarray:
    lib = get_lib()
    Xc = np.ascontiguousarray(X, dtype=np.float64)
    yc = np.ascontiguousarray(y, dtype=np.float64)
    n, p = Xc.shape
    out = np.empty(p, dtype=np.float64)
    lib.stridge_f64(_ptr(Xc), _ptr(yc), n, p, alpha, threshold, max_iter, _ptr(out))
    return out
