"""STFT / mel utilities in pure JAX.

The reference's audio toolkit wraps torch.stft inside ``AudioSignal``
(audiotools/core/audio_signal.py) and builds mel spectrograms for loss
functions (audiotools/metrics/spectral.py).  These are the jittable
equivalents used by the metric library and codec training.

Conventions follow torch.stft(center=True, pad_mode='reflect',
window=hann, normalized=False, onesided=True).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def stft(x: jnp.ndarray, n_fft: int, hop_length: Optional[int] = None,
         win_length: Optional[int] = None, center: bool = True) -> jnp.ndarray:
    """(B, T) -> complex (B, 1 + n_fft//2, frames)."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    win = hann_window(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None]).astype(np.int32)
    frames = x[:, idx] * jnp.asarray(win)[None, None, :]
    return jnp.fft.rfft(frames, axis=-1).transpose(0, 2, 1)


def istft(spec: jnp.ndarray, n_fft: int, hop_length: Optional[int] = None,
          length: Optional[int] = None) -> jnp.ndarray:
    """Inverse STFT with hann overlap-add (torch.istft center=True parity)."""
    hop_length = hop_length or n_fft // 4
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1) * win
    B, n_frames, _ = frames.shape
    T = n_fft + (n_frames - 1) * hop_length
    out = jnp.zeros((B, T))
    norm = jnp.zeros((T,))
    for i in range(n_frames):  # host loop over frames; fine for metrics use
        out = out.at[:, i * hop_length : i * hop_length + n_fft].add(frames[:, i])
        norm = norm.at[i * hop_length : i * hop_length + n_fft].add(win**2)
    out = out / jnp.maximum(norm, 1e-11)[None]
    out = out[:, n_fft // 2 :]
    if length is not None:
        out = out[:, :length]
    return out


def _hz_to_mel(f):
    """HTK-slaney mel scale as used by librosa default (slaney)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (librosa.filters.mel
    algorithm), shape (n_mels, 1 + n_fft//2)."""
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_spectrogram(x: jnp.ndarray, sr: int, n_fft: int, hop_length: int,
                    n_mels: int, fmin: float = 0.0, fmax: Optional[float] = None,
                    power: float = 1.0) -> jnp.ndarray:
    """(B, T) -> (B, n_mels, frames) magnitude^power mel spectrogram."""
    spec = jnp.abs(stft(x, n_fft, hop_length)) ** power
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    return jnp.einsum("mf,bft->bmt", fb, spec)
