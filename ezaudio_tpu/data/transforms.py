"""Declarative, seedable augmentation transforms.

Equivalent of the reference's ``audiotools/data/transforms.py`` protocol
(~30 transforms sharing instantiate/apply with Compose/Choose/Repeat
combinators, :21-1539): every transform

  * draws its random parameters from an explicit ``np.random.Generator``
    via ``instantiate`` (so augmentation is reproducible and batchable);
  * applies with probability ``prob``;
  * operates on ``AudioSignal``s.

Implemented transforms cover the ones the EzAudio data recipes use plus the
common codec-training set: VolumeChange, VolumeNorm, BackgroundNoise,
RoomImpulseResponse, LowPass, HighPass, ClippingDistortion, MuLawQuantize,
Quantize, Identity, and the Compose / Choose / Repeat combinators.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ezaudio_tpu.audio import effects
from ezaudio_tpu.audio.signal import AudioSignal


def _uniform(rng, lo, hi):
    return float(rng.uniform(lo, hi))


class BaseTransform:
    def __init__(self, prob: float = 1.0, name: Optional[str] = None):
        self.prob = prob
        self.name = name or type(self).__name__

    def _instantiate(self, rng: np.random.Generator) -> dict:
        return {}

    def instantiate(self, rng: np.random.Generator) -> dict:
        return {"apply": bool(rng.random() < self.prob),
                **self._instantiate(rng)}

    def _transform(self, signal: AudioSignal, **kwargs) -> AudioSignal:
        return signal

    def transform(self, signal: AudioSignal, **kwargs) -> AudioSignal:
        if not kwargs.pop("apply", True):
            return signal
        return self._transform(signal, **kwargs)

    def __call__(self, signal: AudioSignal, rng: np.random.Generator
                 ) -> AudioSignal:
        return self.transform(signal, **self.instantiate(rng))


class Identity(BaseTransform):
    pass


class VolumeChange(BaseTransform):
    def __init__(self, db: Tuple[float, float] = (-12.0, 0.0), **kw):
        super().__init__(**kw)
        self.db = db

    def _instantiate(self, rng):
        return {"db": _uniform(rng, *self.db)}

    def _transform(self, signal, db):
        signal.audio_data = effects.volume_change(signal.audio_data, db)
        return signal


class VolumeNorm(BaseTransform):
    def __init__(self, db: Tuple[float, float] = (-24.0, -24.0), **kw):
        super().__init__(**kw)
        self.db = db

    def _instantiate(self, rng):
        return {"db": _uniform(rng, *self.db)}

    def _transform(self, signal, db):
        return signal.normalize(db)


class BackgroundNoise(BaseTransform):
    def __init__(self, snr: Tuple[float, float] = (10.0, 30.0),
                 sources: Optional[Sequence[str]] = None, **kw):
        super().__init__(**kw)
        self.snr = snr
        self.sources = list(sources or [])

    def _instantiate(self, rng):
        out = {"snr": _uniform(rng, *self.snr)}
        if self.sources:
            out["source"] = self.sources[int(rng.integers(len(self.sources)))]
        return out

    def _transform(self, signal, snr, source=None):
        if source is not None:
            noise = AudioSignal.excerpt(source, signal.signal_duration,
                                        sr=signal.sample_rate)
            noise_data = noise.audio_data
        else:  # white noise fallback
            noise_data = np.random.default_rng(0).standard_normal(
                signal.audio_data.shape).astype(np.float32) * 0.1
        signal.audio_data = effects.mix(
            signal.audio_data, noise_data[..., : signal.signal_length],
            signal.sample_rate, snr)
        return signal


class RoomImpulseResponse(BaseTransform):
    def __init__(self, sources: Sequence[str] = (), **kw):
        super().__init__(**kw)
        self.sources = list(sources)

    def _instantiate(self, rng):
        return {"source": self.sources[int(rng.integers(len(self.sources)))]} \
            if self.sources else {}

    def _transform(self, signal, source=None):
        if source is None:
            return signal
        ir = AudioSignal.load(source, sr=signal.sample_rate)
        signal.audio_data = effects.apply_ir(signal.audio_data,
                                             ir.audio_data[0, 0])
        return signal


class LowPass(BaseTransform):
    def __init__(self, cutoff: Tuple[float, float] = (4000.0, 8000.0), **kw):
        super().__init__(**kw)
        self.cutoff = cutoff

    def _instantiate(self, rng):
        return {"cutoff": _uniform(rng, *self.cutoff)}

    def _transform(self, signal, cutoff):
        signal.audio_data = effects.lowpass_biquad(
            signal.audio_data, signal.sample_rate, cutoff)
        return signal


class HighPass(BaseTransform):
    def __init__(self, cutoff: Tuple[float, float] = (50.0, 250.0), **kw):
        super().__init__(**kw)
        self.cutoff = cutoff

    def _instantiate(self, rng):
        return {"cutoff": _uniform(rng, *self.cutoff)}

    def _transform(self, signal, cutoff):
        signal.audio_data = effects.highpass_biquad(
            signal.audio_data, signal.sample_rate, cutoff)
        return signal


class ClippingDistortion(BaseTransform):
    def __init__(self, perc: Tuple[float, float] = (0.0, 0.1), **kw):
        super().__init__(**kw)
        self.perc = perc

    def _instantiate(self, rng):
        return {"perc": _uniform(rng, *self.perc)}

    def _transform(self, signal, perc):
        signal.audio_data = effects.clip_distortion(signal.audio_data, 1 - perc)
        return signal


class MuLawQuantize(BaseTransform):
    def __init__(self, channels: int = 256, **kw):
        super().__init__(**kw)
        self.channels = channels

    def _transform(self, signal):
        signal.audio_data = effects.mulaw_quantization(
            signal.audio_data, self.channels)
        return signal


class Quantize(BaseTransform):
    def __init__(self, channels: Tuple[int, int] = (8, 32), **kw):
        super().__init__(**kw)
        self.channels = channels

    def _instantiate(self, rng):
        return {"channels": int(rng.integers(*self.channels))}

    def _transform(self, signal, channels):
        signal.audio_data = effects.quantization(signal.audio_data, channels)
        return signal


# ---------------------------------------------------------------------------
# Combinators
# ---------------------------------------------------------------------------

class Compose(BaseTransform):
    def __init__(self, transforms: List[BaseTransform], **kw):
        super().__init__(**kw)
        self.transforms = transforms

    def _instantiate(self, rng):
        return {"states": [t.instantiate(rng) for t in self.transforms]}

    def _transform(self, signal, states):
        for t, s in zip(self.transforms, states):
            signal = t.transform(signal, **s)
        return signal


class Choose(BaseTransform):
    """Apply exactly one transform, chosen with the given weights."""

    def __init__(self, transforms: List[BaseTransform],
                 weights: Optional[Sequence[float]] = None, **kw):
        super().__init__(**kw)
        self.transforms = transforms
        w = np.asarray(weights if weights is not None else
                       [1.0] * len(transforms), np.float64)
        self.weights = w / w.sum()

    def _instantiate(self, rng):
        idx = int(rng.choice(len(self.transforms), p=self.weights))
        return {"idx": idx, "state": self.transforms[idx].instantiate(rng)}

    def _transform(self, signal, idx, state):
        return self.transforms[idx].transform(signal, **state)


class Repeat(BaseTransform):
    def __init__(self, transform: BaseTransform, n: int = 2, **kw):
        super().__init__(**kw)
        self.inner = transform
        self.n = n

    def _instantiate(self, rng):
        return {"states": [self.inner.instantiate(rng) for _ in range(self.n)]}

    def _transform(self, signal, states):
        for s in states:
            signal = self.inner.transform(signal, **s)
        return signal


# ---------------------------------------------------------------------------
# Spectral / phase transforms (audiotools transforms.py: FrequencyMask,
# TimeMask, CorruptPhase, ShiftPhase, InvertPhase, Smoothing, Silence)
# ---------------------------------------------------------------------------

def _stft_np(x, n_fft=2048, hop=512):
    import jax.numpy as jnp

    from ezaudio_tpu.audio.stft import istft, stft

    return stft, istft, jnp


class _SpectralTransform(BaseTransform):
    n_fft: int = 2048
    hop: int = 512

    def _apply_spec(self, signal: AudioSignal, fn) -> AudioSignal:
        import jax.numpy as jnp

        from ezaudio_tpu.audio.stft import istft, stft

        B, C, T = signal.audio_data.shape
        flat = signal.audio_data.reshape(B * C, T)
        spec = stft(jnp.asarray(flat), self.n_fft, self.hop)
        spec = fn(spec, jnp)
        rec = np.asarray(istft(spec, self.n_fft, self.hop, length=T))
        signal.audio_data = rec.reshape(B, C, T).astype(np.float32)
        return signal


class FrequencyMask(_SpectralTransform):
    def __init__(self, f_center: Tuple[float, float] = (0.0, 1.0),
                 f_width: Tuple[float, float] = (0.05, 0.15), **kw):
        super().__init__(**kw)
        self.f_center, self.f_width = f_center, f_width

    def _instantiate(self, rng):
        return {"center": _uniform(rng, *self.f_center),
                "width": _uniform(rng, *self.f_width)}

    def _transform(self, signal, center, width):
        def fn(spec, jnp):
            F = spec.shape[1]
            lo = int(max(0, (center - width / 2) * F))
            hi = int(min(F, (center + width / 2) * F))
            return spec.at[:, lo:hi, :].set(0)

        return self._apply_spec(signal, fn)


class TimeMask(_SpectralTransform):
    def __init__(self, t_center: Tuple[float, float] = (0.0, 1.0),
                 t_width: Tuple[float, float] = (0.05, 0.15), **kw):
        super().__init__(**kw)
        self.t_center, self.t_width = t_center, t_width

    def _instantiate(self, rng):
        return {"center": _uniform(rng, *self.t_center),
                "width": _uniform(rng, *self.t_width)}

    def _transform(self, signal, center, width):
        def fn(spec, jnp):
            Tf = spec.shape[2]
            lo = int(max(0, (center - width / 2) * Tf))
            hi = int(min(Tf, (center + width / 2) * Tf))
            return spec.at[:, :, lo:hi].set(0)

        return self._apply_spec(signal, fn)


class InvertPhase(_SpectralTransform):
    def _transform(self, signal):
        signal.audio_data = -signal.audio_data
        return signal


class ShiftPhase(_SpectralTransform):
    def __init__(self, shift: Tuple[float, float] = (-np.pi, np.pi), **kw):
        super().__init__(**kw)
        self.shift = shift

    def _instantiate(self, rng):
        return {"shift": _uniform(rng, *self.shift)}

    def _transform(self, signal, shift):
        def fn(spec, jnp):
            return spec * jnp.exp(1j * shift)

        return self._apply_spec(signal, fn)


class CorruptPhase(_SpectralTransform):
    def __init__(self, scale: Tuple[float, float] = (0.1, 1.0), seed: int = 0, **kw):
        super().__init__(**kw)
        self.scale = scale

    def _instantiate(self, rng):
        return {"scale": _uniform(rng, *self.scale),
                "seed": int(rng.integers(2**31 - 1))}

    def _transform(self, signal, scale, seed):
        def fn(spec, jnp):
            noise = np.random.default_rng(seed).uniform(
                -np.pi * scale, np.pi * scale, spec.shape).astype(np.float32)
            return spec * jnp.exp(1j * jnp.asarray(noise))

        return self._apply_spec(signal, fn)


class Smoothing(BaseTransform):
    """Convolve with a short window (audiotools Smoothing)."""

    def __init__(self, window_len: Tuple[int, int] = (8, 64), **kw):
        super().__init__(**kw)
        self.window_len = window_len

    def _instantiate(self, rng):
        return {"n": int(rng.integers(*self.window_len))}

    def _transform(self, signal, n):
        win = np.hanning(n).astype(np.float32)
        win /= win.sum()
        from scipy.signal import fftconvolve

        signal.audio_data = fftconvolve(
            signal.audio_data, win[None, None, :], mode="same").astype(np.float32)
        return signal


class Silence(BaseTransform):
    def _transform(self, signal):
        signal.audio_data = np.zeros_like(signal.audio_data)
        return signal
