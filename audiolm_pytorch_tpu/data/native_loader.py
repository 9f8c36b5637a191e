"""ctypes bindings for the native C++ batch audio loader (native/audioload.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; falls back to the pure-python WAV path if the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["native_available", "load_batch", "probe"]

_SRC = Path(__file__).resolve().parents[2] / "native" / "audioload.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _hashed_lib_path(src: Path, stem: str) -> Path:
    """Build artifact stamped with the SOURCE content hash (ADVICE r3: git
    does not preserve mtimes, so an mtime comparison can silently dlopen a
    stale or foreign-platform binary instead of rebuilding from source)."""
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    return src.parent / f"{stem}.{digest}.so"


def _build(src: Path, lib_path: Path, extra_flags):
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(lib_path),
         str(src), *extra_flags],
        check=True, capture_output=True)


def _get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            _LIB = _hashed_lib_path(_SRC, "libaudioload")
            if not _LIB.exists():
                _build(_SRC, _LIB, ["-lpthread"])
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


# ---------------------------------------------------------------------------
# FFmpeg-backed lossy-format decode (native/ffdecode.cpp): mp3 / webm / ogg...
# Built separately from the wav/flac loader so a missing FFmpeg never affects
# the dependency-free path (reference decodes these via torchaudio's FFmpeg
# wrapping, reference data.py:49-52, 72).
# ---------------------------------------------------------------------------

_FF_SRC = _SRC.parent / "ffdecode.cpp"
_ff_lib = None
_ff_tried = False


def _ff_get_lib():
    global _ff_lib, _ff_tried
    with _lock:
        if _ff_lib is not None or _ff_tried:
            return _ff_lib
        _ff_tried = True
        try:
            _FF_LIB = _hashed_lib_path(_FF_SRC, "libffdecode")
            if not _FF_LIB.exists():
                _build(_FF_SRC, _FF_LIB,
                       ["-lavformat", "-lavcodec", "-lavutil", "-lswresample"])
            lib = ctypes.CDLL(str(_FF_LIB))
            lib.ffd_decode_alloc.restype = ctypes.c_int
            lib.ffd_decode_alloc.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
            lib.ffd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.ffd_encode.restype = ctypes.c_int
            lib.ffd_encode.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_long, ctypes.c_int]
            _ff_lib = lib
        except Exception:
            _ff_lib = None
        return _ff_lib


def ff_available() -> bool:
    return _ff_get_lib() is not None


def ff_decode(path):
    """Decode any FFmpeg-supported audio file -> (mono float32 (T,), rate)."""
    lib = _ff_get_lib()
    if lib is None:
        raise RuntimeError("FFmpeg decoder unavailable (libffdecode build failed)")
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    rate = ctypes.c_int()
    rc = lib.ffd_decode_alloc(str(path).encode(), ctypes.byref(buf),
                              ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise IOError(f"FFmpeg failed to decode {path} (code {rc})")
    out = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    lib.ffd_free(buf)
    return out, int(rate.value)


def ff_encode(path, pcm, rate: int):
    """Encode mono float32 PCM with the container's default codec
    (.mp3 -> lame, .webm -> opus, .ogg -> vorbis). Test-fixture helper."""
    lib = _ff_get_lib()
    if lib is None:
        raise RuntimeError("FFmpeg encoder unavailable (libffdecode build failed)")
    pcm = np.ascontiguousarray(pcm, np.float32)
    rc = lib.ffd_encode(str(path).encode(), pcm, len(pcm), int(rate))
    if rc != 0:
        raise IOError(f"FFmpeg failed to encode {path} (code {rc})")
