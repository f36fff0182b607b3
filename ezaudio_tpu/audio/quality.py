"""Intrusive speech/audio quality metrics.

Equivalent of reference ``audiotools/metrics/quality.py``:
  * ``stoi`` — a native implementation of the Short-Time Objective
    Intelligibility measure (Taal et al. 2010): 1/3-octave band envelope
    correlation over 384 ms analysis windows with clipping;
  * ``pesq`` / ``visqol`` — the reference shells out to external packages
    (pesq, visqol) that are not in this image; these raise with a clear
    gating message, matching the optional-dependency behavior.
"""

from __future__ import annotations

import numpy as np


def _thirdoct(fs: int, n_fft: int, num_bands: int, min_freq: float):
    """1/3-octave band matrix (STOI reference construction)."""
    f = np.linspace(0, fs, n_fft + 1)[: n_fft // 2 + 1]
    k = np.arange(num_bands, dtype=float)
    cf = 2.0 ** (k / 3.0) * min_freq
    lo = 2.0 ** ((2 * k - 1) / 6.0) * min_freq
    hi = 2.0 ** ((2 * k + 1) / 6.0) * min_freq
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        li = int(np.argmin((f - lo[i]) ** 2))
        hi_i = int(np.argmin((f - hi[i]) ** 2))
        obm[i, li:hi_i] = 1.0
    return obm, cf


def _stft_frames(x: np.ndarray, win: int, hop: int, n_fft: int):
    w = np.hanning(win + 2)[1:-1]
    n = 1 + (len(x) - win) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(win)[None]
    return np.fft.rfft(x[idx] * w, n=n_fft, axis=-1)


def stoi(estimate: np.ndarray, reference: np.ndarray, fs: int,
         extended: bool = False) -> float:
    """STOI in [~-1, 1]; inputs are 1-D waveforms at any rate (resampled to
    10 kHz internally, as the metric specifies)."""
    from ezaudio_tpu.data.audio_io import resample

    FS = 10000
    x = resample(np.asarray(reference, np.float32), fs, FS)
    y = resample(np.asarray(estimate, np.float32), fs, FS)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]

    N_FRAME, N_FFT, NUM_BANDS, MIN_FREQ = 256, 512, 15, 150.0
    N = 30  # analysis length in frames (384 ms)
    BETA = -15.0

    # remove silent frames (40 dB below the loudest reference frame)
    hop = N_FRAME // 2
    w = np.hanning(N_FRAME + 2)[1:-1]
    nf = 1 + (n - N_FRAME) // hop
    if nf < N + 1:
        return float("nan")
    idx = np.arange(nf)[:, None] * hop + np.arange(N_FRAME)[None]
    energies = 20 * np.log10(np.linalg.norm(x[idx] * w, axis=1) + 1e-12)
    keep = energies > energies.max() - 40.0
    frames_x = (x[idx] * w)[keep]
    frames_y = (y[idx] * w)[keep]
    if len(frames_x) < N:
        return float("nan")

    X = np.abs(np.fft.rfft(frames_x, n=N_FFT, axis=-1))
    Y = np.abs(np.fft.rfft(frames_y, n=N_FFT, axis=-1))
    obm, _ = _thirdoct(FS, N_FFT, NUM_BANDS, MIN_FREQ)
    Xb = np.sqrt(obm @ (X.T**2)).T  # (frames, bands)
    Yb = np.sqrt(obm @ (Y.T**2)).T

    d = []
    for m in range(N, len(Xb) + 1):
        seg_x = Xb[m - N : m]  # (N, bands)
        seg_y = Yb[m - N : m]
        alpha = np.sqrt((seg_x**2).sum(0) / ((seg_y**2).sum(0) + 1e-12))
        y_scaled = seg_y * alpha[None]
        y_clip = np.minimum(y_scaled, seg_x * (1 + 10 ** (-BETA / 20)))
        xm = seg_x - seg_x.mean(0, keepdims=True)
        ym = y_clip - y_clip.mean(0, keepdims=True)
        corr = (xm * ym).sum(0) / (
            np.linalg.norm(xm, axis=0) * np.linalg.norm(ym, axis=0) + 1e-12)
        d.append(corr.mean())
    return float(np.mean(d))


def pesq(*args, **kwargs):
    raise ImportError(
        "PESQ requires the external 'pesq' package (ITU-T P.862 reference "
        "implementation), which is not available in this environment. "
        "Install `pesq` and call pesq.pesq(sr, ref, deg, 'wb') directly.")


def visqol(*args, **kwargs):
    raise ImportError(
        "ViSQOL requires Google's visqol binary, which is not available in "
        "this environment.")
