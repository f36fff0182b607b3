"""Playback embeds + Whisper extraction (the last gated audiotools rows).

Reference behavior: /root/reference/audiotools/core/playback.py:39-216
(embed/widget/play) and /root/reference/audiotools/core/whisper.py:7-97
(features/transcript/embeddings).  Everything here runs offline: wav
embeds are base64 (no ffmpeg), Whisper features use transformers'
config-only frontend, and the model paths are driven by a tiny
randomly-initialized Whisper.
"""

import base64
import io
import re

import numpy as np
import pytest

from ezaudio_tpu.audio.playback import embed_html, play, widget_html
from ezaudio_tpu.audio.signal import AudioSignal
from ezaudio_tpu.audio.whisper import WhisperWrapper, whisper_features

SR = 16000


def _tone(seconds=0.5, f0=440.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


class TestEmbed:
    def test_embed_roundtrip(self):
        """The base64 payload must decode back to the same audio."""
        from scipy.io import wavfile

        wav = _tone()
        html = embed_html(wav, SR, display=False)
        m = re.search(r"data:audio/wav;base64,([A-Za-z0-9+/=]+)", html)
        assert m, html[:200]
        sr2, pcm = wavfile.read(io.BytesIO(base64.b64decode(m.group(1))))
        assert sr2 == SR
        back = pcm.astype(np.float32) / 32767.0
        assert back.shape == wav.shape
        assert np.max(np.abs(back - wav)) < 2e-4  # 16-bit quantization

    def test_embed_stereo(self):
        from scipy.io import wavfile

        wav = np.stack([_tone(f0=440.0), _tone(f0=880.0)])  # (2, n)
        html = embed_html(wav, SR, display=False)
        m = re.search(r"base64,([A-Za-z0-9+/=]+)", html)
        _, pcm = wavfile.read(io.BytesIO(base64.b64decode(m.group(1))))
        assert pcm.shape == (wav.shape[1], 2)

    def test_widget_structure(self):
        wav = _tone()
        html = widget_html(wav, SR, title="Tone", display=False)
        assert "data:image/png;base64," in html  # spectrogram image
        assert "data:audio/wav;base64," in html  # playable audio
        assert "Tone" in html and "ez-cursor" in html
        # headers exactly once, and omitted when asked
        assert html.count("<style>") == 1
        again = widget_html(wav, SR, add_headers=False, display=False)
        assert "<style>" not in again

    def test_widget_plot_fns(self):
        wav = _tone(0.3)
        for fn in ("waveplot", "wavespec"):
            html = widget_html(wav, SR, plot_fn=fn, display=False,
                               add_headers=False)
            assert "data:image/png;base64," in html

    def test_play_gated(self):
        with pytest.raises(RuntimeError, match="ffplay"):
            play(_tone(0.1), SR)

    def test_signal_methods(self):
        sig = AudioSignal(_tone()[None, None, :], SR)
        assert "audio/wav" in sig.embed(display=False)
        assert "ez-player" in sig.widget("t", display=False)


def _tiny_whisper():
    """Randomly-initialized 2-layer Whisper (no weights needed)."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    return WhisperForConditionalGeneration(cfg)


class _StubProcessor:
    """Duck-typed WhisperProcessor: real feature extractor + toy decode."""

    def __init__(self):
        from transformers import WhisperFeatureExtractor

        self.feature_extractor = WhisperFeatureExtractor()

    def __call__(self, raw, sampling_rate, return_tensors):
        return self.feature_extractor(raw, sampling_rate=sampling_rate,
                                      return_tensors=return_tensors)

    def batch_decode(self, ids):
        return [" ".join(f"tok{int(i)}" for i in row) for row in ids]


class _StubModel:
    """Duck-typed generation model: argmax over a fixed projection of the
    mean feature — deterministic in the input, no transformers generate."""

    def eval(self):
        return self

    def generate(self, inputs, **kw):
        import torch

        mean = inputs.mean(dim=(1, 2), keepdim=True)  # (B,1,1)
        return (torch.arange(3)[None, :] + (mean[:, 0] * 0).long() + 1)

    def get_encoder(self):
        raise AssertionError("transcript path must not touch the encoder")


class TestWhisper:
    def test_features_weight_free(self):
        """Config-only frontend: (1, 80, 3000) log-mel, finite, padded."""
        feats = whisper_features(_tone(), SR)
        assert tuple(feats.shape) == (1, 80, 3000)
        assert np.isfinite(np.asarray(feats)).all()

    def test_features_resamples(self):
        """A 48 kHz input must be resampled to 16 kHz, not truncated."""
        f44 = whisper_features(_tone(sr=48000), 48000)
        f16 = whisper_features(_tone(sr=SR), SR)
        # same audio content -> nearly identical features
        d = np.abs(np.asarray(f44) - np.asarray(f16)).mean()
        assert d < 0.25, d

    def test_embeddings_tiny_model(self):
        """Encoder path through a real (random) Whisper: (1, 750, d)."""
        wrap = WhisperWrapper(processor=_StubProcessor(),
                              whisper_model=_tiny_whisper())
        emb = wrap.embeddings(_tone(), SR)
        assert tuple(emb.shape) == (1, 1500, 32)  # 3000 mel frames / conv stride 2
        assert np.isfinite(emb.numpy()).all()

    def test_transcript_path(self):
        wrap = WhisperWrapper(processor=_StubProcessor(),
                              whisper_model=_StubModel())
        out = wrap.transcript(_tone(), SR)
        assert out == "tok1 tok2 tok3"

    def test_requires_source(self):
        with pytest.raises(ValueError, match="zero-egress"):
            WhisperWrapper()

    def test_signal_integration(self):
        sig = AudioSignal(_tone()[None, None, :], SR)
        feats = sig.get_whisper_features()
        assert tuple(feats.shape) == (1, 80, 3000)
        wrap = WhisperWrapper(processor=_StubProcessor(),
                              whisper_model=_StubModel())
        assert sig.get_whisper_transcript(wrap).startswith("tok")
