"""Parity tests: native flax CLAP vs transformers' ClapModel.

The reference leaves `src/modules/clap_wrapper.py` empty; our CLAP
(models/clap.py + audio/clap.py) fills the seam.  Strategy matches the T5
and HuBERT ports: build a tiny random torch ClapModel, run the state-dict
converter, and compare embeddings/logits.  Includes the shifted-window
path (depths [2, 2] puts a shift-2 block in stage 0) and the bicubic
align-corners time interpolation (T < spec_width).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.models.clap import (
    CLAP, ClapConfig, bicubic_matrix, convert_clap_state_dict)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_config():
    from transformers import ClapAudioConfig as HFA
    from transformers import ClapConfig as HF
    from transformers import ClapTextConfig as HFT

    audio = HFA(
        spec_size=32, num_mel_bins=8, patch_size=4, patch_stride=[4, 4],
        patch_embeds_hidden_size=16, window_size=4, depths=[2, 2],
        num_attention_heads=[2, 4], mlp_ratio=2.0, qkv_bias=True,
        hidden_size=32, projection_dim=20, enable_fusion=False,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    text = HFT(
        vocab_size=120, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        projection_dim=20, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    return HF(text_config=text.to_dict(), audio_config=audio.to_dict(),
              projection_dim=20)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import ClapModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    ref = ClapModel(hf_cfg).eval()
    # randomize the zero-init relative position bias so parity is
    # non-trivial through the bias gather
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0.0, 0.5)
    cfg = ClapConfig.from_hf_config(hf_cfg)
    model = CLAP(cfg)
    params = convert_clap_state_dict(ref.state_dict(), cfg)
    return ref, model, params, cfg


def _audio_input(rng, cfg, frames=None):
    a = cfg.audio
    frames = frames or a.spec_size * a.freq_ratio
    return rng.standard_normal(
        (2, 1, frames, a.num_mel_bins)).astype(np.float32)


class TestBicubic:
    def test_matches_torch_interpolate(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 40, 8)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), (128, 8), mode="bicubic",
            align_corners=True).numpy()
        got = np.einsum("st,bctf->bcsf", bicubic_matrix(40, 128), x)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_identity_when_same_size(self):
        np.testing.assert_allclose(bicubic_matrix(16, 16), np.eye(16))


class TestClapParity:
    def test_audio_embeds_match(self, tiny_pair):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(1)
        feats = _audio_input(rng, cfg)
        with torch.no_grad():
            want = ref.get_audio_features(torch.from_numpy(feats)).numpy()
        got = np.asarray(model.apply(
            {"params": params},
            input_features=jnp.asarray(feats))["audio_embeds"])
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_audio_embeds_match_with_time_interp(self, tiny_pair):
        # frames < spec_size * freq_ratio exercises reshape_mel2img's
        # bicubic align-corners interpolation
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(2)
        feats = _audio_input(rng, cfg, frames=100)
        with torch.no_grad():
            want = ref.get_audio_features(torch.from_numpy(feats)).numpy()
        got = np.asarray(model.apply(
            {"params": params},
            input_features=jnp.asarray(feats))["audio_embeds"])
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_text_embeds_match_with_padding(self, tiny_pair):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(3)
        ids = rng.integers(2, 120, (3, 10)).astype(np.int64)
        mask = np.ones((3, 10), np.int64)
        ids[1, 6:], mask[1, 6:] = 1, 0   # pad tail with the pad id
        ids[:, 0] = 0                     # BOS
        with torch.no_grad():
            want = ref.get_text_features(
                torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask)).numpy()
        got = np.asarray(model.apply(
            {"params": params}, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask))["text_embeds"])
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_similarity_logits_match(self, tiny_pair):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(4)
        feats = _audio_input(rng, cfg)
        ids = rng.integers(2, 120, (2, 8)).astype(np.int64)
        with torch.no_grad():
            out = ref(input_ids=torch.from_numpy(ids),
                      input_features=torch.from_numpy(feats))
            want = out.logits_per_audio.numpy()
        got = model.apply({"params": params},
                          input_features=jnp.asarray(feats),
                          input_ids=jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(got["logits_per_audio"]), want, atol=5e-3)
        # embeddings are unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(got["audio_embeds"]), axis=-1),
            1.0, atol=1e-5)


class TestFeatureExtractor:
    def test_log_mel_matches_hf_extractor(self):
        from transformers import ClapFeatureExtractor

        from ezaudio_tpu.audio.clap import clap_log_mel

        fe = ClapFeatureExtractor(truncation="rand_trunc")
        rng = np.random.default_rng(5)
        wav = rng.standard_normal(48000).astype(np.float32) * 0.1
        want = fe._np_extract_fbank_features(
            wav, np.asarray(fe.mel_filters_slaney))
        got = clap_log_mel(wav[None], 48000)[0]
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_prepare_shapes_and_repeatpad(self):
        from ezaudio_tpu.audio.clap import prepare_clap_audio

        rng = np.random.default_rng(6)
        short = rng.standard_normal((1, 24000)).astype(np.float32)
        feats = prepare_clap_audio(short, 48000)
        assert feats.shape == (1, 1, 1001, 64)
        long = rng.standard_normal((1, 20 * 16000)).astype(np.float32)
        feats = prepare_clap_audio(long, 16000)
        assert feats.shape == (1, 1, 1001, 64)


class TestScorer:
    def test_score_pipeline_random_weights(self, tiny_pair):
        # full wav->score path on the tiny config (feature geometry scaled
        # to the tiny tower: frames <= spec_size*freq_ratio)
        ref, model, params, cfg = tiny_pair
        from ezaudio_tpu.audio.clap import CLAPScorer

        scorer = CLAPScorer(cfg=cfg)
        scorer.params = params
        rng = np.random.default_rng(7)
        a = cfg.audio
        feats = rng.standard_normal(
            (2, 1, 96, a.num_mel_bins)).astype(np.float32)
        emb_a = scorer._audio_fwd(scorer.params, jnp.asarray(feats))
        ids = rng.integers(2, 120, (2, 8))
        emb_t = scorer.embed_text(ids)
        s = np.sum(np.asarray(emb_a) * np.asarray(emb_t), axis=-1)
        assert s.shape == (2,)
        assert np.all(np.abs(s) <= 1.0 + 1e-5)


class TestReviewFixes:
    def test_repeatpad_matches_hf_extractor(self):
        """Short-clip padding must reproduce HF's repeatpad (tile floor +
        zero-pad), not 'repeat' (tile + crop)."""
        from transformers import ClapFeatureExtractor

        from ezaudio_tpu.audio.clap import prepare_clap_audio

        fe = ClapFeatureExtractor(truncation="rand_trunc")
        rng = np.random.default_rng(8)
        wav = (rng.standard_normal(6 * 48000) * 0.1).astype(np.float32)  # 6 s
        want = np.asarray(
            fe(wav, sampling_rate=48000, return_tensors="np")
            .input_features)
        got = prepare_clap_audio(wav, 48000)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   atol=2e-3, rtol=1e-4)

    def test_embed_text_default_mask_from_pad_id(self, tiny_pair):
        """embed_text without an explicit mask must mask pad ids (not
        attend them with an all-ones mask)."""
        ref, model, params, cfg = tiny_pair
        from ezaudio_tpu.audio.clap import CLAPScorer

        scorer = CLAPScorer(cfg=cfg)
        scorer.params = params
        rng = np.random.default_rng(9)
        ids = rng.integers(3, 120, (2, 10)).astype(np.int64)
        ids[:, 0] = 0
        ids[0, 6:] = 1  # pad tail
        mask = (ids != 1).astype(np.int64)
        with torch.no_grad():
            want = ref.get_text_features(
                torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask)).numpy()
        got = np.asarray(scorer.embed_text(ids))   # no mask passed
        np.testing.assert_allclose(got, want, atol=2e-4)
