"""CLAP scoring wrapper — the seam the reference left empty.

`/root/reference/src/modules/clap_wrapper.py` is an empty placeholder for
a CLAP-based text-audio alignment scorer; the EzAudio paper reports CLAP
score among its headline metrics.  This wrapper makes the seam real: a
native flax CLAP (``ezaudio_tpu/models/clap.py``) plus a feature extractor
reproducing ``transformers.ClapFeatureExtractor`` (48 kHz, 1024-point hann
STFT, hop 480, 64 slaney-scale mel bins, dB log-mel, "repeatpad" padding /
center crop to 10 s), so the published `laion/clap-htsat-unfused` weights
are one local file away (same zero-egress policy as every other loader).

Tokenization is host-side (RoBERTa BPE); pass a tokenizer callable (e.g. a
locally-loaded ``transformers`` tokenizer) or precomputed ``input_ids``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.audio.stft import hann_window, mel_filterbank
from ezaudio_tpu.models.clap import (
    CLAP, ClapConfig, convert_clap_state_dict)


def _mel_filterbank_htk(sr: int, n_fft: int, n_mels: int, fmin: float,
                        fmax: float) -> np.ndarray:
    """torchaudio-default mel filterbank (HTK scale, no slaney area norm),
    shape (n_mels, 1 + n_fft//2) — the filters CLAP's "fusion" variant
    uses (ClapFeatureExtractor docstring)."""
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    to_mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    mel_pts = 700.0 * (10.0 ** (np.linspace(to_mel(fmin), to_mel(fmax),
                                            n_mels + 2) / 2595.0) - 1.0)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0, np.minimum(lower, upper)).astype(np.float32)


def clap_log_mel(wav: np.ndarray, sr: int = 48000, n_fft: int = 1024,
                 hop: int = 480, n_mels: int = 64, fmin: float = 0.0,
                 fmax: float = 14000.0, scale: str = "slaney") -> np.ndarray:
    """(B, T) waveform at ``sr`` -> (B, frames, n_mels) dB log-mel,
    matching ClapFeatureExtractor._np_extract_fbank_features (hann STFT
    center=reflect, power 2, 10*log10 with 1e-10 floor).

    The STFT is pinned to the host CPU device: feature extraction is
    host-side by design, and complex-dtype FFTs are unimplemented on the
    axon TPU backend — without the pin a TPU-platform process (e.g. the
    quality harnesses scoring CLAP rows) would crash here."""
    from ezaudio_tpu.audio.stft import stft

    wav = np.atleast_2d(np.asarray(wav, np.float32))
    with jax.default_device(jax.devices("cpu")[0]):
        spec = np.abs(np.asarray(stft(jnp.asarray(wav), n_fft, hop))) ** 2
    fb = (mel_filterbank(sr, n_fft, n_mels, fmin, fmax) if scale == "slaney"
          else _mel_filterbank_htk(sr, n_fft, n_mels, fmin, fmax))
    mel = np.einsum("mf,bft->btm", fb, spec)
    return 10.0 * np.log10(np.maximum(mel, 1e-10)).astype(np.float32)


def prepare_clap_audio(wav: np.ndarray, sr: int, *,
                       target_sr: int = 48000, max_length_s: float = 10.0,
                       padding: str = "repeatpad",
                       fmax: float = 14000.0) -> np.ndarray:
    """Waveform (T,) or (B, T) at ``sr`` -> ``input_features``
    (B, 1, frames, 64) for the audio tower.  Short clips are repeated then
    zero-padded ("repeatpad"); long clips center-cropped (the HF extractor
    random-crops — a fixed crop keeps the metric deterministic)."""
    wav = np.atleast_2d(np.asarray(wav, np.float32))
    if sr != target_sr:
        from ezaudio_tpu.data.audio_io import resample

        wav = resample(wav, sr, target_sr)
    max_len = int(max_length_s * target_sr)
    out = np.zeros((wav.shape[0], max_len), np.float32)
    for b in range(wav.shape[0]):
        w = wav[b]
        if len(w) > max_len:
            start = (len(w) - max_len) // 2
            w = w[start:start + max_len]
        elif len(w) < max_len and len(w) > 0:
            # HF semantics (feature_extraction_clap.py): "repeatpad" tiles
            # floor(max/len) whole copies then zero-pads the remainder;
            # "repeat" tiles one extra copy and crops
            if padding == "repeatpad":
                w = np.tile(w, max_len // len(w))
            elif padding == "repeat":
                w = np.tile(w, max_len // len(w) + 1)[:max_len]
        out[b, :len(w)] = w[:max_len]
    mel = clap_log_mel(out, target_sr, fmax=fmax)
    return mel[:, None, :, :]


class CLAPScorer:
    """Text-audio alignment scoring with the native CLAP.

    ``weights``: transformers-format state dict (torch.load of a local
    ``laion/clap-htsat-unfused`` checkpoint or ``ClapModel.state_dict()``),
    or None for random init (tests).  ``tokenizer``: optional callable
    ``texts -> (input_ids, attention_mask)`` numpy arrays.
    """

    def __init__(self, cfg: Optional[ClapConfig] = None,
                 weights: Optional[Dict[str, Any]] = None,
                 tokenizer=None, dtype: Any = jnp.float32):
        self.cfg = cfg or ClapConfig()
        self.model = CLAP(self.cfg, dtype=dtype)
        self.tokenizer = tokenizer
        if weights is not None:
            self.params = convert_clap_state_dict(weights, self.cfg)
        else:
            a = self.cfg.audio
            frames = a.spec_size * a.freq_ratio
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                input_features=jnp.zeros((1, 1, frames, a.num_mel_bins)),
                input_ids=jnp.ones((1, 4), jnp.int32))["params"]
        self._audio_fwd = jax.jit(lambda p, f: self.model.apply(
            {"params": p}, input_features=f)["audio_embeds"])
        self._text_fwd = jax.jit(lambda p, i, m: self.model.apply(
            {"params": p}, input_ids=i, attention_mask=m)["text_embeds"])

    def embed_audio(self, wav: np.ndarray, sr: int) -> jnp.ndarray:
        """(B?, T) waveform -> (B, projection_dim) normalized embeddings."""
        feats = prepare_clap_audio(wav, sr)
        return self._audio_fwd(self.params, jnp.asarray(feats))

    def embed_text(self, texts_or_ids, attention_mask=None) -> jnp.ndarray:
        if isinstance(texts_or_ids, (list, tuple)) and texts_or_ids and \
                isinstance(texts_or_ids[0], str):
            if self.tokenizer is None:
                raise RuntimeError(
                    "CLAPScorer needs a tokenizer for raw text: pass "
                    "tokenizer=... (e.g. a locally-loaded RobertaTokenizer)"
                    " or precomputed input_ids")
            ids, attention_mask = self.tokenizer(list(texts_or_ids))
        else:
            ids = texts_or_ids
        ids = jnp.asarray(ids, jnp.int32)
        if attention_mask is None:
            # derive from the pad id so padded ids match transformers
            # (all-ones would attend pads AND shift the RoBERTa positions)
            mask = (ids != self.cfg.text.pad_token_id).astype(jnp.int32)
        else:
            mask = jnp.asarray(attention_mask, jnp.int32)
        return self._text_fwd(self.params, ids, mask)

    def score(self, wav: np.ndarray, sr: int, texts_or_ids,
              attention_mask=None) -> np.ndarray:
        """Per-pair cosine similarity (the CLAP score) between audio i and
        text i — the metric the EzAudio paper reports."""
        a = self.embed_audio(wav, sr)
        t = self.embed_text(texts_or_ids, attention_mask)
        return np.asarray(jnp.sum(a * t, axis=-1))
