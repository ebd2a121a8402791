"""Native host-side components (C++ via ctypes).

Compiled lazily with the system toolchain and cached; every consumer
has a pure-Python fallback, so absence of a compiler only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB = None
_TRIED = False


def _build_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get(
        "OPTIMAL_CONV_TPU_CACHE",
        str(pathlib.Path.home() / ".cache" / "optimal_conv_tpu_xla")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _HERE / "crt.cpp"
    so = _build_dir() / "libcrt.so"
    try:
        if (not so.exists()
                or so.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(so))
        lib.crt_decode_centered.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double)]
        lib.crt_decode_centered.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def crt_decode_centered(residues: np.ndarray, mods: list[int],
                        scale: float) -> np.ndarray | None:
    """[L, n] uint64 residues → float64[n] (centered big-int / scale).

    Returns None if the native library is unavailable (caller falls back
    to the Python big-int path).
    """
    lib = _load()
    if lib is None:
        return None
    res = np.ascontiguousarray(residues, dtype=np.uint64)
    m = np.ascontiguousarray(np.array(mods, dtype=np.uint64))
    ln, n = res.shape
    out = np.empty(n, dtype=np.float64)
    lib.crt_decode_centered(
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(ln), ctypes.c_int64(n), ctypes.c_double(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
