"""T5 encoder parity vs. transformers (random tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ezaudio_tpu.text.t5 import (
    T5Encoder,
    T5EncoderConfig,
    convert_t5_encoder_state_dict,
    relative_position_bucket,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", decoder_start_token_id=0,
    )
    model = T5EncoderModel(hf_cfg).eval()
    cfg = T5EncoderConfig.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_t5_encoder_state_dict(sd, cfg)
    return model, T5Encoder(cfg), params


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = torch.arange(-40, 41)[None, :] - torch.zeros(1, dtype=torch.long)
    rel = torch.arange(-40, 41)
    want = T5Attention._relative_position_bucket(
        rel, bidirectional=True, num_buckets=32, max_distance=128).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(rel.numpy()), 32, 128))
    np.testing.assert_array_equal(got, want)


def test_encoder_parity(hf_pair, rng):
    model, enc, params = hf_pair
    ids = rng.integers(0, 96, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), bool)
    mask[0, 8:] = False

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # compare only valid positions (HF computes garbage at padded queries too,
    # but those are never consumed: cross-attn masks them out)
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-4)


def test_encoder_no_mask(hf_pair, rng):
    model, enc, params = hf_pair
    ids = rng.integers(0, 96, size=(1, 7)).astype(np.int32)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_hash_tokenizer_shapes():
    from ezaudio_tpu.text.tokenizer import HashTokenizer

    tok = HashTokenizer()
    ids, mask = tok(["a dog barking", ""], max_length=10)
    assert ids.shape == (2, 10) and mask.shape == (2, 10)
    assert ids[0, mask[0].sum() - 1] == 1  # eos terminates
    assert mask[1].sum() == 1 and ids[1, 0] == 1  # empty string -> just eos
    ids2, _ = tok(["a dog barking"], max_length=10)
    np.testing.assert_array_equal(ids[0], ids2[0])  # deterministic


class TestT5Loading:
    def test_load_from_hf_dir_and_safetensors(self, hf_pair, tmp_path):
        """EzAudio's t5_path accepts a raw .pt, a HF checkout dir, or a
        .safetensors file."""
        import torch as _torch

        from ezaudio_tpu.api.ezaudio import _load_t5_state_dict

        model, enc, params = hf_pair
        sd = model.state_dict()

        # raw .pt
        pt = str(tmp_path / "t5.pt")
        _torch.save(sd, pt)
        loaded = _load_t5_state_dict(pt)
        assert "shared.weight" in loaded

        # safetensors inside a HF-style dir
        from safetensors.numpy import save_file

        d = tmp_path / "hf"
        d.mkdir()
        save_file({k: v.numpy() for k, v in sd.items()},
                  str(d / "model.safetensors"))
        loaded2 = _load_t5_state_dict(str(d))
        np.testing.assert_array_equal(loaded2["shared.weight"],
                                      loaded["shared.weight"].numpy()
                                      if hasattr(loaded["shared.weight"], "numpy")
                                      else loaded["shared.weight"])
