"""ctypes binding for the native C++ audio ingest (native/ezaudio_native.cpp).

Builds the shared library on first use with g++ (cached next to the
source); falls back to the pure-Python loader when no compiler is
available.  The torch-DataLoader-with-16-processes role of the reference
(src/train.py:190) is covered by ``ez_load_batch``'s thread pool: one call
decodes, crops, pads and normalizes a whole batch in parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ezaudio_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libezaudio_native.so")

_lib = None


def _build() -> Optional[str]:
    try:
        if os.path.exists(_LIB) and (
                not os.path.exists(_SRC)  # prebuilt .so shipped sourceless
                or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        # compile to a private temp name and rename into place: concurrent
        # first-use builders (pytest-xdist, multi-process launches) must
        # never dlopen a half-written .so
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        return None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ez_decode_wav.restype = ctypes.c_int64
    lib.ez_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.ez_load_batch.restype = ctypes.c_int32
    lib.ez_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_wav(path: str, max_seconds: float = 600.0) -> Tuple[np.ndarray, int]:
    """Native full-file decode -> (mono float32, sr)."""
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    max_frames = int(max_seconds * 384000)
    out = np.empty(max_frames, np.float32)
    sr = ctypes.c_int32(0)
    n = lib.ez_decode_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"native decode failed ({n}): {path}")
    return out[:n].copy(), int(sr.value)


def load_batch(
    paths: Sequence[str],
    seg_len: int,
    expected_sr: int,
    normalize: bool = True,
    seed: int = 0,
    n_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel batch ingest: (B, seg_len) float32 + per-item status."""
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    B = len(paths)
    out = np.zeros((B, seg_len), np.float32)
    status = np.zeros(B, np.int32)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    lib.ez_load_batch(
        arr, B, seg_len, expected_sr, int(normalize),
        np.uint64(seed or 1), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, status
