"""Parity tests: native flax Whisper vs transformers' torch Whisper.

Reference surface: /root/reference/audiotools/core/whisper.py:7-97 (the
WhisperMixin).  tests/test_playback_whisper.py covers the torch-wrapper
path; this file validates the NATIVE tower (ezaudio_tpu/models/whisper.py)
the same way the HuBERT/T5/CLAP ports are validated: random tiny torch
model -> state-dict converter -> bitwise-close outputs, plus the log-mel
front-end against transformers' WhisperFeatureExtractor numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.models.whisper import (
    WhisperConfig, WhisperModel, WhisperTranscriber,
    convert_whisper_state_dict, greedy_decode, whisper_log_mel)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SR = 16000


def _tiny_hf_config(**over):
    from transformers import WhisperConfig as HF

    kw = dict(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0)
    kw.update(over)
    return HF(**kw)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    ref = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = WhisperConfig.from_hf_config(hf_cfg)
    model = WhisperModel(cfg)
    params = convert_whisper_state_dict(ref.state_dict(), cfg)
    return ref, model, params, cfg


def _audio(seconds=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)


@pytest.fixture(scope="module")
def feats(tiny_pair):
    """(1, 80, 3000) log-mel through OUR front-end, shared by all tests."""
    return np.asarray(whisper_log_mel(jnp.asarray(_audio()[None])))


class TestFrontend:
    def test_log_mel_matches_hf_extractor(self):
        from transformers import WhisperFeatureExtractor

        fe = WhisperFeatureExtractor()
        wav = _audio()
        theirs = fe([wav], sampling_rate=SR,
                    return_tensors="np").input_features[0]
        ours = np.asarray(whisper_log_mel(jnp.asarray(wav[None])))[0]
        assert ours.shape == theirs.shape == (80, 3000)
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)

    def test_trims_long_audio(self):
        long = np.tile(_audio(), 20)[: 35 * SR]  # 35 s > the 30 s chunk
        out = whisper_log_mel(jnp.asarray(long[None]))
        assert out.shape == (1, 80, 3000)


class TestParity:
    def test_encoder(self, tiny_pair, feats):
        ref, model, params, cfg = tiny_pair
        with torch.inference_mode():
            theirs = ref.model.encoder(
                torch.from_numpy(feats)).last_hidden_state.numpy()
        ours = np.asarray(model.apply({"params": params},
                                      jnp.asarray(feats),
                                      method=WhisperModel.encode))
        assert ours.shape == theirs.shape == (1, cfg.max_source_positions,
                                              cfg.d_model)
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-4)

    def test_full_forward_logits(self, tiny_pair, feats):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(1)
        dec_ids = rng.integers(0, cfg.vocab_size, (1, 7)).astype(np.int64)
        with torch.inference_mode():
            theirs = ref(input_features=torch.from_numpy(feats),
                         decoder_input_ids=torch.from_numpy(dec_ids),
                         ).logits.numpy()
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(feats),
                                      jnp.asarray(dec_ids, jnp.int32)))
        np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)

    def test_greedy_matches_torch_greedy(self, tiny_pair, feats):
        """Our single-scan greedy == a hand-rolled torch greedy loop
        (HF generate() adds logits processors a raw decoder lacks)."""
        ref, model, params, cfg = tiny_pair
        P, N = 1, 8
        prompt = (cfg.decoder_start_token_id,)
        ids = np.full((1, P + N), cfg.eos_token_id, np.int64)
        ids[:, :P] = prompt
        done = np.zeros((1,), bool)
        with torch.inference_mode():
            for pos in range(P, P + N):
                logits = ref(
                    input_features=torch.from_numpy(feats),
                    decoder_input_ids=torch.from_numpy(ids[:, :pos]),
                ).logits.numpy()
                nxt = logits[:, -1].argmax(-1)
                nxt = np.where(done, cfg.eos_token_id, nxt)
                ids[:, pos] = nxt
                done |= nxt == cfg.eos_token_id
        ours = greedy_decode(model, params, jnp.asarray(feats), prompt,
                             max_new_tokens=N)
        np.testing.assert_array_equal(ours, ids)


class TestTranscriber:
    def test_embeddings_and_ids(self, tiny_pair):
        ref, _, _, cfg = tiny_pair
        tr = WhisperTranscriber(SR, cfg=cfg, weights=ref.state_dict())
        emb = tr.embeddings(_audio())
        assert emb.shape == (1, cfg.max_source_positions, cfg.d_model)
        ids = tr.transcribe(_audio(), max_new_tokens=4)
        assert ids.shape == (1, 5) and ids.dtype == np.int32

    def test_eos_pins_tail(self, tiny_pair):
        """Everything after the first EOS must be EOS."""
        ref, _, _, cfg = tiny_pair
        tr = WhisperTranscriber(SR, cfg=cfg, weights=ref.state_dict())
        row = tr.transcribe(_audio(seed=3), max_new_tokens=12)[0]
        hits = np.where(row[1:] == cfg.eos_token_id)[0]
        if hits.size:
            assert (row[1 + hits[0]:] == cfg.eos_token_id).all()

    def test_resamples_and_duck_types_signal(self, tiny_pair):
        from ezaudio_tpu.audio.signal import AudioSignal

        ref, _, _, cfg = tiny_pair
        tr = WhisperTranscriber(48000, cfg=cfg, weights=ref.state_dict())
        sig = AudioSignal(_audio()[None, None, ::1].repeat(1, axis=0), SR)
        # signal passes its own sr — overrides the constructor default
        emb = sig.get_whisper_embeddings(tr)
        assert emb.shape[-1] == cfg.d_model
        ids = sig.get_whisper_transcript(tr)
        assert ids.shape[0] == 1

    def test_random_init_without_weights(self):
        cfg = WhisperConfig(vocab_size=32, d_model=16, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=2,
                            decoder_attention_heads=2, encoder_ffn_dim=32,
                            decoder_ffn_dim=32, max_source_positions=100,
                            max_target_positions=16,
                            decoder_start_token_id=1, eos_token_id=2)
        tr = WhisperTranscriber(SR, cfg=cfg)
        out = tr.features(_audio(0.5))
        assert out.shape == (1, 80, 200)
