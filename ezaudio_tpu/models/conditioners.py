"""Condition extractors for ControlNet conditioning.

Parity targets (reference ``src/models/conditions/``):
  * ``EnergyExtractor`` (energy.py:7-56): framewise mean-square energy,
    reflect padding, dB floor, per-clip max normalization — the conditioner
    of the published energy ControlNet (ckpts/controlnet/energy_l.yml);
  * ``MultibandEnergyExtractor`` (mbenergy.py:9-72): julius-style windowed-
    sinc band split then per-band energy (without the reference's debug
    ``sf.write`` side effects);
  * ``ChromaExtractor`` (chroma.py:11-69): normalized power spectrogram ->
    chroma filterbank -> inf-norm -> optional argmax one-hot;
  * ``VoiceConversionExtractor`` (voice.py:19-36): ContentVec features —
    requires external pretrained weights; exposed as a host-side seam that
    accepts any callable feature extractor.

All extractors are pure jittable functions of (B, T) waveforms returning
(B, frames, C) features; the ``Conditioner`` facade transposes/tiles like
the reference wrapper (condition_wrapper.py:9-41) — except that in our
channel-last world the (B, T, C) output is already the model layout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Energy
# ---------------------------------------------------------------------------

def frame_energy(audio: jnp.ndarray, hop_size: int, window_size: int,
                 padding: str = "reflect") -> jnp.ndarray:
    """Framewise mean of squares: (B, T) -> (B, T // hop).

    Implemented as hop-chunk partial sums + a short moving sum (when
    ``window % hop == 0``, the EzAudio configs) or a cumsum difference —
    ``lax.reduce_window`` with a 1920-wide window overflows scoped VMEM on
    TPU for 10 s clips."""
    n_frames = audio.shape[-1] // hop_size
    pad = (window_size - hop_size) // 2
    # right pad takes the odd remainder so the LAST frame's window
    # [start, start + window) stays inside the padded signal (with a
    # symmetric //2 pad and odd window-hop the final cumsum index clamped
    # one short, silently truncating the last frame's energy)
    pad_r = (window_size - hop_size) - pad
    mode = {"reflect": "reflect", "constant": "constant"}[padding]
    x = jnp.pad(audio, ((0, 0), (pad, pad_r)), mode=mode)
    sq = jnp.square(x)
    B, Tp = sq.shape
    if window_size % hop_size == 0:
        r = window_size // hop_size
        n_chunks = Tp // hop_size
        chunk_sums = sq[:, : n_chunks * hop_size].reshape(
            B, n_chunks, hop_size).sum(axis=-1)
        sums = sum(chunk_sums[:, i : i + n_frames] for i in range(r))
    else:
        cs = jnp.concatenate(
            [jnp.zeros((B, 1), sq.dtype), jnp.cumsum(sq, axis=-1)], axis=-1)
        starts = jnp.arange(n_frames) * hop_size
        sums = cs[:, starts + window_size] - cs[:, starts]
    return sums[:, :n_frames] / window_size


def energy_condition(audio: jnp.ndarray, hop_size: int = 512,
                     window_size: int = 1024, padding: str = "reflect",
                     min_db: float = -60.0, norm: bool = True,
                     quantize_levels: Optional[int] = None) -> jnp.ndarray:
    """(B, T) -> (B, frames, 1) normalized dB energy (energy.py parity)."""
    energy = frame_energy(audio, hop_size, window_size, padding)
    gain = jnp.maximum(energy, 10.0 ** (min_db / 10.0))
    gain_db = 10.0 * jnp.log10(gain)
    if norm:
        max_db = jnp.max(gain_db, axis=-1, keepdims=True)
        gain_db = (gain_db - min_db) / (max_db - min_db + 1e-8)
    if quantize_levels is not None:
        gain_db = jnp.round(gain_db * (quantize_levels - 1)) / (quantize_levels - 1)
    return gain_db[..., None]


# ---------------------------------------------------------------------------
# Multiband energy (julius-style sinc band split)
# ---------------------------------------------------------------------------

def _lowpass_kernel(cutoff: float, zeros: float = 8.0) -> np.ndarray:
    """Windowed-sinc FIR lowpass at normalized cutoff (0.5 = Nyquist),
    julius.LowPassFilters construction."""
    half_size = int(zeros / cutoff / 2)
    t = np.arange(-half_size, half_size + 1, dtype=np.float64)
    win = np.hanning(2 * half_size + 1)
    k = 2 * cutoff * win * np.sinc(2 * cutoff * t)
    # julius normalizes the windowed sinc to exact unity DC gain
    # ("otherwise we could have a small leakage of the constant component")
    k = k / k.sum()
    return k.astype(np.float32)


def split_bands(audio: jnp.ndarray, n_bands: int, sample_rate: int,
                zeros: float = 8.0) -> jnp.ndarray:
    """(B, T) -> (n_bands, B, T) adjacent frequency bands that sum to the
    input (julius.split_bands semantics: equally spaced cutoffs)."""
    cutoffs = [(i + 1) / n_bands / 2 for i in range(n_bands - 1)]
    lows = []
    for c in cutoffs:
        k = _lowpass_kernel(c, zeros)
        pad = len(k) // 2
        y = jax.lax.conv_general_dilated(
            audio[:, :, None], jnp.asarray(k)[:, None, None],
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"))[:, :, 0]
        lows.append(y)
    bands = []
    prev = jnp.zeros_like(audio)
    for y in lows:
        bands.append(y - prev)
        prev = y
    bands.append(audio - prev)
    return jnp.stack(bands, axis=0)


def multiband_energy_condition(
    audio: jnp.ndarray, hop_size: int = 512, window_size: int = 1024,
    padding: str = "reflect", min_db: float = -60.0, norm: bool = True,
    quantize_levels: Optional[int] = None, n_bands: int = 8,
    control_bands: int = 4, sample_rate: int = 24000) -> jnp.ndarray:
    """(B, T) -> (B, frames, control_bands) (mbenergy.py parity)."""
    bands = split_bands(audio, n_bands, sample_rate)[:control_bands]
    nb, B, T = bands.shape
    energy = frame_energy(bands.reshape(nb * B, T), hop_size, window_size, padding)
    energy = energy.reshape(nb, B, -1)
    gain = jnp.maximum(energy, 10.0 ** (min_db / 10.0))
    gain_db = 10.0 * jnp.log10(gain)
    if norm:
        max_db = jnp.max(gain_db, axis=(0, 2), keepdims=True)
        gain_db = (gain_db - min_db) / (max_db - min_db + 1e-8)
    if quantize_levels is not None:
        gain_db = jnp.round(gain_db * (quantize_levels - 1)) / (quantize_levels - 1)
    return gain_db.transpose(1, 2, 0)  # (B, frames, bands)


# ---------------------------------------------------------------------------
# Chroma
# ---------------------------------------------------------------------------

def chroma_filterbank(sr: int, n_fft: int, n_chroma: int = 12,
                      tuning: float = 0.0, ctroct: float = 5.0,
                      octwidth: float = 2.0) -> np.ndarray:
    """Chroma filterbank, shape (n_chroma, 1 + n_fft // 2).

    Standard A440 construction (Ellis' fft2chromamx, as shipped by librosa
    with L2 column norm, octave-5 gaussian weighting and C-based rolling):
    each FFT bin is mapped to fractional chroma bins and weighted by a
    gaussian around the nearest chroma.
    """
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    A440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = n_chroma * np.log2(frequencies / (A440 / 16))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts /= np.maximum(np.sqrt(np.sum(wts**2, axis=0, keepdims=True)), 1e-12)
    wts *= np.tile(
        np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
        (n_chroma, 1))
    # base_c: rotate so chroma 0 = C
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : int(1 + n_fft / 2)], dtype=np.float32)


def _hann(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def spectrogram_power(audio: jnp.ndarray, n_fft: int, win_length: int,
                      hop_length: int) -> jnp.ndarray:
    """torchaudio.Spectrogram(power=2, center=False, normalized=True)
    equivalent: (B, T) -> (B, freq, frames)."""
    win = _hann(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    win_j = jnp.asarray(win)
    T = audio.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None]).astype(np.int32)
    frames = audio[:, idx] * win_j[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.abs(spec)) / jnp.sum(jnp.square(win_j))
    return power.transpose(0, 2, 1)


def chroma_condition(audio: jnp.ndarray, sample_rate: int, n_chroma: int = 12,
                     radix2_exp: int = 12, nfft: Optional[int] = None,
                     winlen: Optional[int] = None, winhop: Optional[int] = None,
                     argmax: bool = True) -> jnp.ndarray:
    """(B, T) -> (B, frames, n_chroma) (chroma.py parity, inf-norm)."""
    winlen = winlen or 2**radix2_exp
    nfft = nfft or winlen
    winhop = winhop or winlen // 4

    T = audio.shape[-1]
    if T < nfft:
        pad = nfft - T
        audio = jnp.pad(audio, ((0, 0), (pad // 2, pad - pad // 2)))
    p = int(nfft // 2 - winhop // 2)
    audio = jnp.pad(audio, ((0, 0), (p, p)), mode="reflect")

    spec = spectrogram_power(audio, nfft, winlen, winhop)  # (B, F, frames)
    fb = jnp.asarray(chroma_filterbank(sample_rate, nfft, n_chroma))
    raw = jnp.einsum("cf,bft->bct", fb, spec)
    # inf-norm over the chroma axis (torch F.normalize p=inf)
    denom = jnp.maximum(jnp.max(jnp.abs(raw), axis=-2, keepdims=True), 1e-6)
    norm = raw / denom
    norm = norm.transpose(0, 2, 1)  # (B, t, c)
    if argmax:
        one_hot = jax.nn.one_hot(jnp.argmax(norm, axis=-1), n_chroma, dtype=norm.dtype)
        return one_hot
    return norm


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------

class Conditioner:
    """Condition extractor facade (condition_wrapper.py:9-41).

    __call__(waveform (B, T), latent_shape) -> (B, frames, C) condition,
    already in our channel-last layout.
    """

    def __init__(self, condition_type: str, **kwargs):
        self.condition_type = condition_type
        self.kwargs = kwargs
        if condition_type == "energy":
            self.fn = jax.jit(partial(energy_condition, **kwargs))
        elif condition_type == "mb_energy":
            self.fn = jax.jit(partial(multiband_energy_condition, **kwargs))
        elif condition_type == "chroma":
            self.fn = jax.jit(partial(chroma_condition, **kwargs))
        elif condition_type == "vc":
            # ContentVec/HuBERT content features (reference
            # src/models/conditions/voice.py:19-36).  Native flax tower:
            # pass weights= (a transformers-format state dict, e.g.
            # torch.load of a local ContentVec ckpt) and sr=.  A custom
            # callable can still be injected via kwargs['extractor'].
            if "extractor" in kwargs:
                self.fn = kwargs["extractor"]
            else:
                from ezaudio_tpu.models.hubert import (
                    HubertConfig, VoiceConversionExtractor)

                if kwargs.get("weights") is None:
                    import warnings

                    warnings.warn(
                        "Conditioner('vc') built WITHOUT weights: the HuBERT"
                        "/ContentVec tower is randomly initialized and its "
                        "features are meaningless for real conditioning. "
                        "Pass weights= (a transformers-format state dict) "
                        "or extractor=.", stacklevel=2)
                self.fn = VoiceConversionExtractor(
                    sr=kwargs.get("sr", 24000),
                    cfg=kwargs.get("hubert_config") or HubertConfig(),
                    weights=kwargs.get("weights"),
                    dtype=kwargs.get("dtype", jnp.float32))
        else:
            raise NotImplementedError(condition_type)

    def __call__(self, waveform, latent_shape=None):
        cond = self.fn(jnp.asarray(waveform))
        if latent_shape is not None and len(latent_shape) == 4:
            # 2D spectrogram latents (B, T, F, C): tile the condition over
            # the frequency axis by X = F_lat * T_cond / T_lat
            # (condition_wrapper.py:33-36 exactly — the replication factor
            # scales with the condition/latent frame-rate ratio so the
            # total condition area matches the latent area), channel-last.
            T_lat, F_lat = latent_shape[1], latent_shape[2]
            assert cond.shape[1] % T_lat == 0, (cond.shape, latent_shape)
            X = F_lat * cond.shape[1] // T_lat
            cond = jnp.repeat(cond[:, :, None, :], X, axis=2)
        return cond
