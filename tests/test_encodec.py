"""EnCodec codec family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.codecs.encodec import Encodec

TINY = dict(channels=1, dimension=8, n_filters=2, ratios=(4, 2), n_q=3,
            codebook_size=16, sample_rate=8000, use_lstm=True)


@pytest.fixture(scope="module")
def model():
    m = Encodec(**TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 1)) * 0.3
    variables = m.init(key, x)
    return m, variables, x


class TestEncodec:
    def test_forward_shapes(self, model):
        m, variables, x = model
        out = m.apply(variables, x)
        assert out["audio"].shape == x.shape
        assert out["codes"].shape == (2, 3, 64 // 8)  # hop = 4*2
        assert np.isfinite(float(out["commitment_loss"]))

    def test_encode_decode_roundtrip_consistency(self, model):
        m, variables, x = model
        codes = m.apply(variables, x, method=lambda mm, xx: mm.encode(xx))
        wav = m.apply(variables, codes, method=lambda mm, c: mm.decode(c))
        out = m.apply(variables, x)
        # decode(encode(x)) must equal the forward audio
        np.testing.assert_allclose(np.asarray(wav[:, : x.shape[1]]),
                                   np.asarray(out["audio"]), atol=1e-5)

    def test_partial_bandwidth(self, model):
        m, variables, x = model
        codes1 = m.apply(variables, x, 1, method=lambda mm, xx, n: mm.encode(xx, n))
        assert codes1.shape[1] == 1

    def test_residual_refinement(self, model):
        """With a zero vector in every codebook (as training would learn),
        more codebooks cannot increase quantization error."""
        m, variables, x = model
        variables = jax.tree_util.tree_map_with_path(
            lambda path, v: (v.at[0].set(0.0)
                             if any(getattr(p, "key", "") == "codebook"
                                    for p in path) else v),
            variables)
        z = m.apply(variables, x, method=lambda mm, xx: mm.encoder(xx))
        errs = []
        for n in (1, 3):
            zq, codes, _, _ = m.apply(variables, z, n,
                                      method=lambda mm, zz, nn: mm.quantizer(zz, nn))
            errs.append(float(jnp.mean(jnp.square(z - zq))))
        assert errs[1] <= errs[0] + 1e-7, errs

    @pytest.mark.heavy  # 29 s grad compile through SEANet+LSTM+RVQ
    def test_gradients_flow(self, model):
        m, variables, x = model

        def loss(v):
            out = m.apply(v, x)
            return jnp.mean(jnp.square(out["audio"] - x)) + out["commitment_loss"]

        g = jax.grad(loss)(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        enc_g = jax.tree.leaves(g["params"]["encoder"])
        assert max(float(jnp.abs(l).max()) for l in enc_g) > 0


class TestEncodecFacade:
    def test_facade_encodec_slot(self, model):
        from ezaudio_tpu.codecs.facade import AutoencoderFacade

        m, variables, x = model
        facade = AutoencoderFacade(m, variables["params"],
                                   quantization_first=True,
                                   model_type="encodec")
        z = facade.encode(x)
        wav = facade.decode(z)
        assert wav.shape[0] == x.shape[0] and wav.shape[2] == 1


class TestEncodecReviewFixes:
    def test_codebooks_receive_gradient(self, model):
        """The codebook loss must train the codebooks (upstream uses EMA;
        gradient-based VQ-VAE form here) — d(loss)/d(codebook) != 0."""
        m, variables, x = model

        def loss(v):
            out = m.apply(v, x)
            return out["vq/codebook_loss"] + out["vq/commitment_loss"]

        g = jax.grad(loss)(variables)
        cb_g = [np.asarray(l) for p, l in
                jax.tree_util.tree_flatten_with_path(g)[0]
                if any(getattr(k, "key", "") == "codebook" for k in p)]
        assert cb_g and max(float(np.abs(l).max()) for l in cb_g) > 0

    def test_decoder_exact_length(self, model):
        """decode(encode(x)) must return exactly hop*frames samples — the
        odd ratio (5 upstream, here via an odd-ratio model) used to lose
        samples through symmetric transpose-conv padding."""
        m5 = Encodec(channels=1, dimension=8, n_filters=2, ratios=(5, 2),
                     n_q=2, codebook_size=16, sample_rate=8000,
                     use_lstm=False)
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (1, 80, 1)) * 0.3
        variables = m5.init(key, x)
        codes = m5.apply(variables, x, method=lambda mm, xx: mm.encode(xx))
        wav = m5.apply(variables, codes, method=lambda mm, c: mm.decode(c))
        assert wav.shape[1] == 80, wav.shape  # 8 frames x hop 10

    def test_invalid_n_q_raises(self, model):
        m, variables, x = model
        for bad in (0, 99):
            with pytest.raises(ValueError):
                m.apply(variables, x, bad,
                        method=lambda mm, xx, n: mm.encode(xx, n))

    def test_vq_keys_for_codec_trainer(self, model):
        m, variables, x = model
        out = m.apply(variables, x)
        assert np.isfinite(float(out["vq/commitment_loss"]))
        assert np.isfinite(float(out["vq/codebook_loss"]))
