"""AutoencoderFacade review-fix regressions: from_config import, chunked
short-input fallback, q-last chunked channel count."""

import numpy as np



class TestFacadeReviewFixes:
    REF_CFG = {"model": {
        "io_channels": 1, "latent_dim": 4,
        "encoder": {"config": {"channels": 4, "c_mults": [1, 2],
                               "strides": [2, 2], "latent_dim": 4}},
        "decoder": {"config": {"channels": 4, "c_mults": [1, 2],
                               "strides": [2, 2], "final_tanh": False}},
        "bottleneck": {"type": "vae"},
    }}

    def _vae(self):
        from ezaudio_tpu.codecs.oobleck import AudioVAE

        return AudioVAE(io_channels=1, channels=4, latent_dim=4,
                        c_mults=(1, 2), strides=(2, 2))

    def test_from_config_classmethod(self):
        """AutoencoderFacade.from_config used to NameError on the missing
        vae_from_config import."""
        import jax

        from ezaudio_tpu.codecs.facade import AutoencoderFacade
        from ezaudio_tpu.codecs.oobleck import vae_from_config

        model = vae_from_config(self.REF_CFG)
        x = np.zeros((1, 64, 1), np.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        facade = AutoencoderFacade.from_config(self.REF_CFG, params)
        z = facade.encode(x, sample=False)
        assert z.shape[0] == 1

    def test_chunked_short_input_falls_back(self):
        import jax

        from ezaudio_tpu.codecs.facade import AutoencoderFacade

        model = self._vae()
        x = np.asarray(np.random.default_rng(0).standard_normal(
            (1, 64, 1)), np.float32)  # far below chunk_size*ratio
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        facade = AutoencoderFacade(model, params)
        z = facade.encode_audio(x, chunked=True, sample=False)
        zu = facade.encode(x, sample=False)
        np.testing.assert_allclose(np.asarray(z), np.asarray(zu))
        w = facade.decode_audio(z, chunked=True)
        assert w.shape[1] == 64

    def test_chunked_encode_q_last_channels(self):
        """quantization_first=False: the chunked path must carry the
        2*latent (mean||scale) channel count."""
        import jax

        from ezaudio_tpu.codecs.facade import AutoencoderFacade

        model = self._vae()  # ratio = 4
        rng = np.random.default_rng(0)
        x = np.asarray(rng.standard_normal((1, 4 * 40, 1)), np.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        facade = AutoencoderFacade(model, params, quantization_first=False)
        z = facade.encode_audio(x, chunked=True, chunk_size=16, overlap=8)
        assert z.shape == (1, 40, 8)  # 2 * latent_dim
