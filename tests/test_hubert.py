"""Parity tests: flax HuBERT tower vs transformers' HubertModel (the vc
conditioner's feature extractor — reference src/models/conditions/voice.py).

Same strategy as the T5 port: random tiny torch model -> state-dict
converter -> compare last_hidden_state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.models.hubert import (
    HubertConfig, HubertEncoder, VoiceConversionExtractor,
    convert_hubert_state_dict)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_config(**over):
    from transformers import HubertConfig as HF

    kw = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        conv_bias=False, feat_extract_norm="group",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, layer_norm_eps=1e-5,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0, final_dropout=0.0,
        classifier_proj_size=8,
    )
    kw.update(over)
    return HF(**kw)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import HubertModel

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    ref = HubertModel(hf_cfg).eval()
    cfg = HubertConfig.from_hf_config(hf_cfg)
    model = HubertEncoder(cfg)
    params = convert_hubert_state_dict(ref.state_dict(), cfg)
    return ref, model, params, cfg


class TestHubertParity:
    def test_last_hidden_state_matches(self, tiny_pair):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 800)).astype(np.float32)

        with torch.no_grad():
            want = ref(torch.from_numpy(audio)).last_hidden_state.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_masked_forward_matches(self, tiny_pair):
        ref, model, params, cfg = tiny_pair
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((2, 800)).astype(np.float32)
        mask = np.ones((2, 800), np.int64)
        mask[1, 500:] = 0  # second element padded

        with torch.no_grad():
            want = ref(torch.from_numpy(audio),
                       attention_mask=torch.from_numpy(mask)
                       ).last_hidden_state.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(audio),
                                     jnp.asarray(mask, bool)))
        # compare only valid frames of each element (HF zeroes padded input
        # but the conv still smears; valid-frame parity is the contract)
        lengths = mask.sum(-1)
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            lengths = (lengths - k) // s + 1
        for b in range(2):
            n = int(lengths[b])
            np.testing.assert_allclose(got[b, :n], want[b, :n], atol=2e-4)

    def test_layer_norm_variant(self):
        """ContentVec-large uses feat_extract_norm='layer' + stable LN."""
        from transformers import HubertModel

        torch.manual_seed(1)
        hf_cfg = _tiny_hf_config(feat_extract_norm="layer",
                                 do_stable_layer_norm=True, conv_bias=True)
        ref = HubertModel(hf_cfg).eval()
        cfg = HubertConfig.from_hf_config(hf_cfg)
        model = HubertEncoder(cfg)
        params = convert_hubert_state_dict(ref.state_dict(), cfg)

        rng = np.random.default_rng(2)
        audio = rng.standard_normal((1, 640)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(audio)).last_hidden_state.numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestVoiceConversionExtractor:
    def test_matches_reference_recipe(self, tiny_pair):
        """The extractor = resample->pad 40->encoder, like voice.py:31-36."""
        ref, model, params, cfg = tiny_pair
        vc = VoiceConversionExtractor(sr=16000, cfg=cfg, weights=None)
        vc.params = params  # use the converted weights

        rng = np.random.default_rng(3)
        audio = rng.standard_normal((1, 800)).astype(np.float32)
        pad = (400 - 320) // 2
        padded = torch.from_numpy(np.pad(audio, ((0, 0), (pad, pad))))
        with torch.no_grad():
            want = ref(padded).last_hidden_state.numpy()
        got = np.asarray(vc(jnp.asarray(audio)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_resamples_to_16k(self, tiny_pair):
        _, model, params, cfg = tiny_pair
        vc = VoiceConversionExtractor(sr=24000, cfg=cfg, weights=None)
        vc.params = params
        rng = np.random.default_rng(4)
        audio = rng.standard_normal((1, 1200)).astype(np.float32)  # 50 ms @24k
        out = np.asarray(vc(jnp.asarray(audio)))
        # 1200 @24k -> 800 @16k -> +80 pad -> conv stack
        n = 880
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            n = (n - k) // s + 1
        assert out.shape == (1, n, cfg.hidden_size)

    def test_conditioner_vc_wiring(self, tiny_pair):
        from ezaudio_tpu.models.conditioners import Conditioner

        _, model, params, cfg = tiny_pair
        cond = Conditioner("vc", sr=16000, hubert_config=cfg)
        cond.fn.params = params
        rng = np.random.default_rng(5)
        wav = rng.standard_normal((2, 800)).astype(np.float32)
        out = np.asarray(cond(wav))
        assert out.ndim == 3 and out.shape[0] == 2
        assert out.shape[-1] == cfg.hidden_size
        assert np.isfinite(out).all()
