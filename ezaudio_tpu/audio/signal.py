"""AudioSignal: a lightweight batched waveform container.

The load-bearing subset of the reference's vendored descript-audiotools
``AudioSignal`` (audiotools/core/audio_signal.py:53-1681) — the methods the
EzAudio stack and our data/metric layers actually exercise:

  load/excerpt/salient_excerpt, resample, zero_pad, to_mono, truncate,
  peak/loudness normalization, STFT/iSTFT + magnitude/phase, mel
  spectrogram, loudness, write, arithmetic and indexing.

Design: a thin host-side numpy container (B, C, T) with numpy/scipy DSP;
anything on the training/inference hot path uses the jittable functions in
``ezaudio_tpu.audio.stft`` directly instead — this class is the data-prep /
evaluation convenience layer.
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np

from ezaudio_tpu.audio.loudness import integrated_loudness
from ezaudio_tpu.data.audio_io import load_wav, resample as _resample, save_wav


class AudioSignal:
    def __init__(self, audio_data: np.ndarray, sample_rate: int,
                 metadata: Optional[dict] = None):
        x = np.asarray(audio_data, np.float32)
        if x.ndim == 1:
            x = x[None, None, :]
        elif x.ndim == 2:
            x = x[None, :, :]
        assert x.ndim == 3, "audio_data must be (T,), (C, T) or (B, C, T)"
        self.audio_data = x
        self.sample_rate = int(sample_rate)
        # side-channel facts about the source file (e.g. whole-file
        # "loudness" written by the manifest builder), as in the reference
        # audio_signal metadata dict
        self.metadata = dict(metadata or {})

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str, sr: Optional[int] = None,
             offset: float = 0.0, duration: Optional[float] = None
             ) -> "AudioSignal":
        wav, rate = load_wav(path, sr=sr, mono=False)
        if wav.ndim == 1:
            wav = wav[None, :]
        if offset or duration is not None:
            s = int(offset * rate)
            e = s + int(duration * rate) if duration is not None else None
            wav = wav[:, s:e]
        return cls(wav, rate)

    @classmethod
    def _excerpt_of(cls, sig: "AudioSignal", duration: float,
                    rng: np.random.Generator,
                    offset: Optional[int] = None) -> "AudioSignal":
        n = int(duration * sig.sample_rate)
        total = sig.signal_length
        start = (int(rng.integers(0, max(total - n, 0) + 1))
                 if offset is None else int(offset))
        out = sig.audio_data[..., start : start + n]
        if out.shape[-1] < n:
            out = np.pad(out, ((0, 0), (0, 0), (0, n - out.shape[-1])))
        return cls(out, sig.sample_rate, metadata={"offset": start})

    @classmethod
    def excerpt(cls, path: str, duration: float, state: Optional[np.random.Generator] = None,
                sr: Optional[int] = None,
                offset: Optional[int] = None) -> "AudioSignal":
        """Random fixed-duration excerpt (audio_signal.py excerpt).  Pass
        ``offset`` (samples at the target rate) to pin the window — used
        by aligned paired-data loading; the drawn offset is recorded in
        ``metadata["offset"]`` either way."""
        return cls._excerpt_of(cls.load(path, sr=sr), duration,
                               state or np.random.default_rng(), offset)

    @classmethod
    def salient_excerpt(cls, path: str, duration: float,
                        loudness_cutoff: float = -40.0, max_tries: int = 8,
                        state: Optional[np.random.Generator] = None,
                        sr: Optional[int] = None) -> "AudioSignal":
        """Re-draw excerpts until one is louder than the cutoff
        (audio_signal.py salient_excerpt).  The file is decoded/resampled
        ONCE; only the window is redrawn per try."""
        rng = state or np.random.default_rng()
        sig = cls.load(path, sr=sr)
        best = None
        for _ in range(max_tries):
            ex = cls._excerpt_of(sig, duration, rng)
            if ex.loudness() > loudness_cutoff:
                return ex
            best = ex
        return best

    # ------------------------------------------------------------------
    @property
    def batch_size(self):
        return self.audio_data.shape[0]

    @property
    def num_channels(self):
        return self.audio_data.shape[1]

    @property
    def signal_length(self):
        return self.audio_data.shape[-1]

    @property
    def signal_duration(self):
        return self.signal_length / self.sample_rate

    # ------------------------------------------------------------------
    def clone(self) -> "AudioSignal":
        return copy.deepcopy(self)

    def to_mono(self) -> "AudioSignal":
        self.audio_data = self.audio_data.mean(axis=1, keepdims=True)
        return self

    def resample(self, sample_rate: int) -> "AudioSignal":
        if sample_rate != self.sample_rate:
            self.audio_data = _resample(self.audio_data, self.sample_rate, sample_rate)
            self.sample_rate = sample_rate
        return self

    def zero_pad(self, before: int, after: int) -> "AudioSignal":
        self.audio_data = np.pad(self.audio_data,
                                 ((0, 0), (0, 0), (before, after)))
        return self

    def zero_pad_to(self, length: int) -> "AudioSignal":
        pad = max(0, length - self.signal_length)
        return self.zero_pad(0, pad)

    def truncate_samples(self, length: int) -> "AudioSignal":
        self.audio_data = self.audio_data[..., :length]
        return self

    def peak_normalize(self, eps: float = 1e-9) -> "AudioSignal":
        self.audio_data = self.audio_data / (np.abs(self.audio_data).max() + eps)
        return self

    def loudness(self):
        """Integrated LUFS — a float for batch 1, (B,) array otherwise
        (per-item, matching audiotools; a single item-0 measurement would
        mis-normalize every other batch item)."""
        vals = np.array([integrated_loudness(item.T, self.sample_rate)
                         for item in self.audio_data])
        return float(vals[0]) if len(vals) == 1 else vals

    def normalize(self, db: float = -24.0) -> "AudioSignal":
        """Loudness-normalize each item to target LUFS (audiotools effects
        normalize)."""
        cur = np.atleast_1d(self.loudness())
        gain = np.where(np.isfinite(cur), 10.0 ** ((db - cur) / 20), 1.0)
        self.audio_data = self.audio_data * gain[:, None, None]
        return self

    def ensure_max_of_audio(self, maximum: float = 1.0) -> "AudioSignal":
        peak = np.abs(self.audio_data).max()
        if peak > maximum:
            self.audio_data = self.audio_data * (maximum / peak)
        return self

    # ------------------------------------------------------------------
    def stft(self, n_fft: int = 2048, hop_length: Optional[int] = None):
        import jax.numpy as jnp

        from ezaudio_tpu.audio.stft import stft as _stft

        B, C, T = self.audio_data.shape
        flat = self.audio_data.reshape(B * C, T)
        spec = np.asarray(_stft(jnp.asarray(flat), n_fft, hop_length or n_fft // 4))
        return spec.reshape(B, C, *spec.shape[1:])

    def magnitude(self, n_fft: int = 2048, hop_length: Optional[int] = None):
        return np.abs(self.stft(n_fft, hop_length))

    def phase(self, n_fft: int = 2048, hop_length: Optional[int] = None):
        return np.angle(self.stft(n_fft, hop_length))

    def mel_spectrogram(self, n_mels: int = 80, n_fft: int = 2048,
                        hop_length: Optional[int] = None):
        import jax.numpy as jnp

        from ezaudio_tpu.audio.stft import mel_spectrogram as _mel

        B, C, T = self.audio_data.shape
        flat = self.audio_data.reshape(B * C, T)
        m = np.asarray(_mel(jnp.asarray(flat), self.sample_rate, n_fft,
                            hop_length or n_fft // 4, n_mels))
        return m.reshape(B, C, *m.shape[1:])

    def mfcc(self, n_mfcc: int = 40, n_mels: int = 80,
             log_offset: float = 1e-6, n_fft: int = 2048,
             hop_length: Optional[int] = None):
        """Mel-frequency cepstral coefficients: log-mel projected by an
        orthonormal DCT-II (reference audio_signal.py:1398-1426).
        Returns (B, C, n_mfcc, frames)."""
        mel = self.mel_spectrogram(n_mels, n_fft, hop_length)  # (B,C,M,T)
        log_mel = np.log(mel + log_offset)
        # orthonormal DCT-II matrix (n_mels, n_mfcc), torchaudio create_dct
        n = np.arange(n_mels, dtype=np.float64)
        k = np.arange(n_mfcc, dtype=np.float64)
        dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
        dct *= np.sqrt(2.0 / n_mels)
        dct[:, 0] *= 1.0 / np.sqrt(2.0)
        out = np.einsum("bcmt,mk->bckt", log_mel, dct.astype(np.float32))
        return out.astype(np.float32)

    # ------------------------------------------------------------------
    def write(self, path: str) -> "AudioSignal":
        from ezaudio_tpu.data.audio_io import save_audio

        save_audio(path, self.audio_data[0].T, self.sample_rate)
        return self

    # ------------------------------------------------------------------
    # Playback / notebook embeds (PlayMixin equivalent, playback.py:39-216)
    def embed(self, display: bool = True) -> str:
        from ezaudio_tpu.audio.playback import embed_html

        return embed_html(self.audio_data[0], self.sample_rate, display=display)

    def widget(self, title: Optional[str] = None, **kwargs) -> str:
        from ezaudio_tpu.audio.playback import widget_html

        return widget_html(self.audio_data[0], self.sample_rate,
                           title=title, **kwargs)

    def play(self) -> "AudioSignal":
        from ezaudio_tpu.audio.playback import play as _play

        _play(self.audio_data[0], self.sample_rate)
        return self

    # ------------------------------------------------------------------
    # Whisper extraction (WhisperMixin equivalent, whisper.py:7-97);
    # `wrapper` is a WhisperWrapper — required for transcript/embeddings
    # (no weights ship in this image), optional for features.
    def get_whisper_features(self, wrapper=None):
        if wrapper is not None:
            return wrapper.features(self.audio_data[0], self.sample_rate)
        from ezaudio_tpu.audio.whisper import whisper_features

        return whisper_features(self.audio_data[0], self.sample_rate)

    def get_whisper_transcript(self, wrapper) -> str:
        return wrapper.transcript(self.audio_data[0], self.sample_rate)

    def get_whisper_embeddings(self, wrapper):
        return wrapper.embeddings(self.audio_data[0], self.sample_rate)

    # ------------------------------------------------------------------
    def _coerce(self, other):
        return other.audio_data if isinstance(other, AudioSignal) else other

    def __add__(self, other):
        out = self.clone()
        out.audio_data = out.audio_data + self._coerce(other)
        return out

    __radd__ = __add__

    def __sub__(self, other):
        out = self.clone()
        out.audio_data = out.audio_data - self._coerce(other)
        return out

    def __neg__(self):
        out = self.clone()
        out.audio_data = -out.audio_data
        return out

    def __mul__(self, other):
        out = self.clone()
        out.audio_data = out.audio_data * self._coerce(other)
        return out

    __rmul__ = __mul__

    def __truediv__(self, other):
        out = self.clone()
        out.audio_data = out.audio_data / self._coerce(other)
        return out

    def __iadd__(self, other):
        self.audio_data = self.audio_data + self._coerce(other)
        return self

    def __imul__(self, other):
        self.audio_data = self.audio_data * self._coerce(other)
        return self

    def __len__(self):
        return self.batch_size

    def __eq__(self, other):
        if not isinstance(other, AudioSignal):
            return NotImplemented
        return (self.sample_rate == other.sample_rate
                and self.audio_data.shape == other.audio_data.shape
                and bool(np.array_equal(self.audio_data, other.audio_data)))

    __hash__ = None

    def apply_codec(self, preset: str = "8-bit") -> "AudioSignal":
        """Lossy-codec degradation simulation (effects.apply_codec)."""
        from ezaudio_tpu.audio.effects import apply_codec as _ac

        self.audio_data = _ac(self.audio_data, self.sample_rate, preset)
        return self

    def __getitem__(self, idx) -> "AudioSignal":
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return AudioSignal(self.audio_data[idx], self.sample_rate)

    @classmethod
    def batch(cls, signals) -> "AudioSignal":
        """Collate same-rate signals, zero-padding to the longest
        (audiotools util.collate behavior)."""
        sr = signals[0].sample_rate
        assert all(s.sample_rate == sr for s in signals)
        n = max(s.signal_length for s in signals)
        data = np.concatenate(
            [s.clone().zero_pad_to(n).audio_data for s in signals], axis=0)
        return cls(data, sr)

    def __repr__(self):
        return (f"AudioSignal(batch={self.batch_size}, ch={self.num_channels}, "
                f"dur={self.signal_duration:.2f}s @ {self.sample_rate} Hz)")
