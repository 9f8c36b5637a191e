"""ctypes bindings for the native C++ batch audio loader (native/audioload.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; falls back to the pure-python WAV path if the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["native_available", "load_batch", "probe"]

_SRC = Path(__file__).resolve().parents[2] / "native" / "audioload.cpp"
_LIB = _SRC.parent / "libaudioload.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_LIB),
         str(_SRC), "-lpthread"],
        check=True, capture_output=True)


def _get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
            lib.al_load_batch.restype = ctypes.c_int
            lib.al_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
                ctypes.c_ulonglong,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int,
            ]
            lib.al_probe.restype = ctypes.c_int
            lib.al_probe.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def probe(path):
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    length = ctypes.c_long()
    rate = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.al_probe(str(path).encode(), ctypes.byref(length),
                      ctypes.byref(rate), ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"failed to probe {path}")
    return int(length.value), int(rate.value), int(ch.value)


def load_batch(paths, max_length: int, *, seed: int = 0, num_threads: int = 8):
    """Decode + downmix + random-crop/pad a batch of WAVs in parallel.
    Returns (out (n, max_length) float32, lengths (n,), rates (n,))."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, max_length), np.float32)
    lengths = np.zeros((n,), np.int64)
    rates = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.al_load_batch(arr, n, max_length, seed, out, lengths, rates,
                           num_threads)
    if rc != 0:
        raise IOError(f"failed to decode {paths[rc - 1]}")
    return out, lengths, rates
