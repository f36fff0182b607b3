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


def load_wav(path: str, sr: int | None = None, mono: bool = True
             ) -> Tuple[np.ndarray, int]:
    """Load a wav file -> (float32 waveform in [-1, 1], sample_rate).

    Mirrors ``librosa.load(path, sr=sr)`` semantics: mono downmix and
    resampling to ``sr`` when given.  Returns shape (T,) for mono.
    """
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


def peak_normalize(wav: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Peak normalization as used by the reference editing/eval paths
    (api/ezaudio.py:147)."""
    return wav / (np.max(np.abs(wav)) + eps)
