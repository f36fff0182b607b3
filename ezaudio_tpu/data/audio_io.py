"""Audio file IO and resampling without librosa/soundfile.

The reference leans on librosa/soundfile for wav IO (api/ezaudio.py:146,
src/inference.py:134-169).  Neither is installed here; scipy is, and wav
covers the reference's actual usage, so IO is built on ``scipy.io.wavfile``
with polyphase resampling from ``scipy.signal``.
"""

from __future__ import annotations

from math import gcd
from typing import Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling along the last axis."""
    if orig_sr == target_sr:
        return wav
    g = gcd(orig_sr, target_sr)
    return resample_poly(wav, target_sr // g, orig_sr // g, axis=-1).astype(wav.dtype)


def _is_wav(path: str) -> bool:
    """RIFF/WAVE by magic when readable, extension otherwise."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
        return head[:4] == b"RIFF" and head[8:12] == b"WAVE"
    except OSError:
        return path.lower().endswith(".wav")


def load_wav(path: str, sr: int | None = None, mono: bool = True
             ) -> Tuple[np.ndarray, int]:
    """Load an audio file -> (float32 waveform in [-1, 1], sample_rate).

    Mirrors ``librosa.load(path, sr=sr)`` semantics: mono downmix and
    resampling to ``sr`` when given.  Returns shape (T,) for mono.

    wav parses natively (scipy RIFF); every other format (mp3/flac/ogg/
    opus/...) decodes through the in-process libavcodec bridge
    (native/ezaudio_codec.cpp) — the reference forks the ffmpeg binary for
    these (audiotools/core/ffmpeg.py:87-204), which this image doesn't
    ship and a host ingest path shouldn't need.
    """
    if not _is_wav(path):
        from ezaudio_tpu.data import codec_loader

        if not codec_loader.available():
            raise ImportError(
                f"Decoding {path} requires the native codec bridge "
                "(libavformat/libavcodec + g++), which is unavailable in "
                "this environment; only .wav is supported without it.")
        data, file_sr = codec_loader.decode(path, mono=mono)
        # match the wav branch's shapes: (T,) mono, (C, T) multichannel
        wav = data if mono else (data.T if data.ndim == 2 else data[None, :])
        if sr is not None and sr != file_sr:
            wav = resample(wav, file_sr, sr)
            file_sr = sr
        return wav, file_sr
    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1) if mono else wav.T
    if sr is not None and sr != file_sr:
        wav = resample(wav, file_sr, sr)
        file_sr = sr
    return wav, file_sr


def save_wav(path: str, wav: np.ndarray, sr: int, subtype: str = "float"):
    """Write mono/stereo wav; ``subtype`` 'float' (f32) or 'pcm16'."""
    wav = np.asarray(wav)
    if wav.ndim == 2 and wav.shape[0] < wav.shape[1]:
        wav = wav.T  # (T, C)
    if subtype == "pcm16":
        data = np.clip(wav, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    else:
        data = wav.astype(np.float32)
    wavfile.write(path, sr, data)


def save_audio(path: str, wav: np.ndarray, sr: int,
               subtype: str = "float", bitrate: int = 0):
    """Write audio in the container named by the extension: .wav natively,
    anything else (mp3/flac/ogg/...) through the libavcodec bridge (the
    reference writes these via soundfile/ffmpeg, audio_signal.py write)."""
    if path.lower().endswith(".wav"):
        return save_wav(path, wav, sr, subtype=subtype)
    from ezaudio_tpu.data import codec_loader

    if not codec_loader.available():
        raise ImportError(
            f"Encoding {path} requires the native codec bridge "
            "(libavformat/libavcodec + g++); use .wav without it.")
    wav = np.asarray(wav)
    if wav.ndim == 2 and wav.shape[0] < wav.shape[1]:
        wav = wav.T  # (T, C), matching save_wav's convention
    codec_loader.encode(path, wav, sr, bitrate=bitrate)


def peak_normalize(wav: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Peak normalization as used by the reference editing/eval paths
    (api/ezaudio.py:147)."""
    return wav / (np.max(np.abs(wav)) + eps)
