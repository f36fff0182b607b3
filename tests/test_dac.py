"""DAC codec tests: golden parity, RVQ properties, DACFile round trip,
discriminator shapes, GAN loss behavior."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

TINY = dict(encoder_dim=4, encoder_rates=(2, 4), latent_dim=8,
            decoder_dim=16, decoder_rates=(4, 2), n_codebooks=3,
            codebook_size=16, codebook_dim=4, sample_rate=8000)


def load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run scripts/gen_goldens.py")
    return dict(np.load(path, allow_pickle=False))


@pytest.fixture(scope="module")
def dac_pair():
    from ezaudio_tpu.codecs.dac import DAC
    from ezaudio_tpu.convert.torch_to_jax import convert_dac_state_dict

    d = load("dac_tiny.npz")
    sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
    params = convert_dac_state_dict(sd, n_enc_blocks=2, n_dec_blocks=2,
                                    n_codebooks=3)
    model = DAC(**TINY)
    return model, {"params": params}, d


class TestDACParity:
    def test_full_forward(self, dac_pair):
        model, params, d = dac_pair
        out = model.apply(params, jnp.asarray(d["x"].transpose(0, 2, 1)))
        np.testing.assert_array_equal(np.asarray(out["codes"]), d["codes"])
        np.testing.assert_allclose(np.asarray(out["z"]),
                                   d["z"].transpose(0, 2, 1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["latents"]),
                                   d["latents"].transpose(0, 2, 1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["audio"]),
                                   d["audio"].transpose(0, 2, 1), atol=1e-4)
        np.testing.assert_allclose(float(out["vq/commitment_loss"]),
                                   float(d["commitment"]), rtol=1e-4)
        np.testing.assert_allclose(float(out["vq/codebook_loss"]),
                                   float(d["codebook"]), rtol=1e-4)


class TestRVQ:
    def test_from_codes_roundtrip(self, dac_pair):
        model, params, d = dac_pair
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        out = model.apply(params, x)

        zq2 = model.apply(params, out["codes"],
                          method=lambda m, c: m.quantizer.from_codes(c)[0])
        np.testing.assert_allclose(np.asarray(zq2), np.asarray(out["z"]), atol=1e-5)

    def test_n_quantizers_partial(self, dac_pair):
        model, params, d = dac_pair
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        out1 = model.apply(params, x, n_quantizers=1)
        out3 = model.apply(params, x, n_quantizers=3)
        assert out1["codes"].shape[1] == 1
        assert out3["codes"].shape[1] == 3

    def test_quantizer_dropout_training(self, dac_pair):
        from ezaudio_tpu.codecs.dac import DAC

        model = DAC(**dict(TINY, quantizer_dropout=0.5))
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 64, 1))
        variables = model.init({"params": key, "dropout": key}, x, train=True)
        out = model.apply(variables, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert out["codes"].shape == (4, 3, 8)
        assert np.isfinite(float(out["vq/commitment_loss"]))

    @pytest.mark.heavy  # 17 s grad compile through the full RVQ stack
    def test_straight_through_gradients(self, dac_pair):
        model, params, d = dac_pair
        x = jnp.asarray(d["x"].transpose(0, 2, 1))

        def loss(p):
            out = model.apply(p, x)
            return jnp.mean(jnp.square(out["audio"])) + out["vq/commitment_loss"]

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
        # encoder gets gradient through the straight-through estimator
        enc_g = jax.tree.leaves(g["params"]["encoder"])
        assert max(float(jnp.abs(v).max()) for v in enc_g) > 0


class TestDACFile:
    def test_compress_decompress_roundtrip(self, dac_pair, tmp_path):
        from ezaudio_tpu.codecs.dacfile import DACCodec, DACFile

        model, params, d = dac_pair
        codec = DACCodec(model, params["params"])
        wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 8000)).astype(np.float32)
        f = codec.compress(wav, 8000, win_duration=1.0)
        assert f.codes.shape[1] == 3
        p = f.save(str(tmp_path / "clip"))
        f2 = DACFile.load(p)
        np.testing.assert_array_equal(f2.codes, f.codes)
        rec = codec.decompress(f2)
        assert rec.shape == wav.shape
        assert np.isfinite(rec).all()


class TestDiscriminator:
    @pytest.mark.heavy  # 20 s multi-scale/multi-period disc compile
    def test_shapes_and_gan_losses(self, rng):
        from ezaudio_tpu.codecs.discriminator import (
            Discriminator, discriminator_loss, generator_loss)

        disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=(),
                             sample_rate=8000)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 4096, 1))
        variables = disc.init(key, x)
        fm_real = disc.apply(variables, x)
        fm_fake = disc.apply(variables, x * 0.5 + 0.1)
        assert len(fm_real) == 3  # 2 MPD + 1 MRD
        ld = float(discriminator_loss(fm_fake, fm_real))
        lg, lf = generator_loss(fm_fake, fm_real)
        assert np.isfinite([ld, float(lg), float(lf)]).all()
        # identical inputs -> zero feature-matching loss
        _, lf0 = generator_loss(fm_real, fm_real)
        assert float(lf0) == 0.0


class TestChunkedDAC:
    def test_chunked_encode_decode(self, dac_pair):
        from ezaudio_tpu.codecs.facade import AutoencoderFacade

        model, params, d = dac_pair
        facade = AutoencoderFacade(model, params["params"],
                                   quantization_first=True, model_type="dac")
        rng = np.random.default_rng(0)
        wav = (0.3 * rng.standard_normal((1, 64 * 8, 1))).astype(np.float32)
        z = facade.encode_audio(wav, chunked=True, overlap=8, chunk_size=24)
        assert z.shape == (1, 64, 8)
        rec = facade.decode_audio(z, chunked=True, overlap=8, chunk_size=24)
        assert rec.shape == (1, 64 * 8, 1)


class TestRVQReviewFixes:
    def test_from_latents_partial_width(self, dac_pair):
        """A latent slab covering only some codebooks must use the last
        full boundary (reference from_latents), not crash on a partial
        slice."""
        model, params, d = dac_pair
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        out = model.apply(params, x)
        latents = out["latents"]  # (B, T, n_codebooks * codebook_dim)
        dim = latents.shape[-1] // out["codes"].shape[1]
        for width_books in (1, 2):
            part = latents[..., : width_books * dim + dim // 2]  # partial
            zq, zp, codes = model.apply(
                params, part, method=lambda m, l: m.quantizer.from_latents(l))
            assert codes.shape[1] == width_books
        # full width reproduces the forward z_q
        zq_full, _, _ = model.apply(
            params, latents, method=lambda m, l: m.quantizer.from_latents(l))
        np.testing.assert_allclose(np.asarray(zq_full), np.asarray(out["z"]),
                                   atol=1e-5)

    def test_training_ignores_n_quantizers(self, dac_pair):
        """Reference parity: train=True runs all codebooks regardless of
        n_quantizers."""
        model, params, d = dac_pair
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        out = model.apply(params, x, n_quantizers=1, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        assert out["codes"].shape[1] == model.n_codebooks


class TestDACFileLoudnessRestore:
    def test_decompress_remasures_reconstruction(self, dac_pair):
        """Reference parity (base.py:285): decompress must re-measure the
        RECONSTRUCTION's loudness and gain to the recorded input_db — not
        assume the decode sits at the compress-side normalize_db."""
        from ezaudio_tpu.audio.loudness import integrated_loudness
        from ezaudio_tpu.codecs.dacfile import DACCodec

        model, params, d = dac_pair
        codec = DACCodec(model, params["params"] if "params" in params
                         else params)
        sr = model.sample_rate
        t = np.arange(2 * sr) / sr
        wav = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        in_db = integrated_loudness(wav, sr)
        # compress WITHOUT normalization: the old decompress assumed the
        # default -16 dB and mis-scaled by (input_db + 16) dB
        f = codec.compress(wav, sr, normalize_db=None)
        out = codec.decompress(f)
        assert len(out) == len(wav)
        out_db = integrated_loudness(out, sr)
        if np.isfinite(out_db) and np.isfinite(in_db):
            assert abs(out_db - in_db) < 1.0, (out_db, in_db)
