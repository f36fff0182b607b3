"""ctypes binding for the native compressed-audio codec bridge
(native/ezaudio_codec.cpp, linking the system libavformat/libavcodec).

The reference decodes non-wav formats by forking the ffmpeg BINARY per
file (reference audiotools/core/ffmpeg.py:87-204); this image ships only
the FFmpeg libraries, and an in-process link is the right shape for a
host ingest path anyway (no fork, no stdout reparse).  Builds with g++ on
first use (cached next to the source); ``available()`` is False when the
libraries or compiler are absent, and callers fall back to wav-only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ezaudio_codec.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libezaudio_codec.so")

_lib = None
_lib_failed = False


def _build() -> Optional[str]:
    try:
        if os.path.exists(_LIB) and (
                not os.path.exists(_SRC)
                or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp,
             "-lavformat", "-lavcodec", "-lavutil"],
            check=True, capture_output=True, timeout=180)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        return None


def get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    path = _build()
    if path is None:
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:  # built elsewhere, libav runtime missing here
        _lib_failed = True
        return None
    lib.ez_codec_probe.restype = ctypes.c_int32
    lib.ez_codec_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
    lib.ez_codec_decode.restype = ctypes.c_int64
    lib.ez_codec_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.ez_codec_encode.restype = ctypes.c_int32
    lib.ez_codec_encode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def probe(path: str) -> Tuple[int, int, float]:
    """(sample_rate, channels, duration_s).  duration may be a container
    estimate (-1.0 when unknown); decode for the exact frame count."""
    lib = get_lib()
    assert lib is not None, "native codec bridge unavailable"
    sr = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    dur = ctypes.c_double(0.0)
    rc = lib.ez_codec_probe(path.encode(), ctypes.byref(sr),
                            ctypes.byref(ch), ctypes.byref(dur))
    if rc != 0:
        raise IOError(f"codec probe failed ({rc}): {path}")
    return int(sr.value), int(ch.value), float(dur.value)


def decode(path: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Decode any libav-supported format.

    Returns (float32 audio, sr); audio is (frames,) when mono else
    (frames, channels).  Resampling is the caller's job (the polyphase
    resampler in ezaudio_tpu.audio — identical DSP for wav and mp3).
    """
    lib = get_lib()
    assert lib is not None, "native codec bridge unavailable"
    sr_p, ch_p, dur = probe(path)
    # container duration can undershoot (VBR estimates): headroom + retry
    est = int(max(dur, 0.0) * sr_p * (1 if mono else max(ch_p, 1)))
    cap = max(est + est // 8 + (1 << 18), 1 << 20)
    for _ in range(4):
        out = np.empty(cap, np.float32)
        sr = ctypes.c_int32(0)
        ch = ctypes.c_int32(0)
        n = lib.ez_codec_decode(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size, int(mono), ctypes.byref(sr), ctypes.byref(ch))
        if n == -7:  # buffer too small
            cap *= 2
            continue
        if n < 0:
            raise IOError(f"codec decode failed ({n}): {path}")
        audio = out[:n].copy()
        if not mono and ch.value > 1:
            audio = audio.reshape(-1, ch.value)
        return audio, int(sr.value)
    raise IOError(f"codec decode overflow after retries: {path}")


def encode(path: str, audio: np.ndarray, sr: int, codec: str = "",
           bitrate: int = 0) -> None:
    """Encode float32 audio -> ``path``; container from the extension
    (.mp3/.flac/.ogg/.wav), codec override + bitrate optional."""
    lib = get_lib()
    assert lib is not None, "native codec bridge unavailable"
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[:, None]
    frames, channels = audio.shape
    pcm = np.ascontiguousarray(audio.reshape(-1))
    rc = lib.ez_codec_encode(
        path.encode(), pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, int(sr), int(channels), codec.encode(), int(bitrate))
    if rc != 0:
        raise IOError(f"codec encode failed ({rc}): {path}")
