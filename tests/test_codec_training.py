"""Codec adversarial training smoke tests (tiny VAE + tiny DAC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.codecs.dac import DAC
from ezaudio_tpu.codecs.discriminator import Discriminator
from ezaudio_tpu.codecs.oobleck import AudioVAE
from ezaudio_tpu.training.codec_trainer import (
    init_codec_train_state, inverse_lr, make_codec_train_steps)


def tiny_disc():
    return Discriminator(periods=(2,), fft_sizes=(128,), rates=(),
                         sample_rate=8000)


class TestInverseLR:
    def test_decay_shape(self):
        fn = inverse_lr(1.0, inv_gamma=100, power=0.5, warmup=0.0)
        assert abs(float(fn(jnp.asarray(0))) - 1.0) < 1e-6
        assert float(fn(jnp.asarray(300))) < 1.0 / 1.9

    def test_warmup_suppresses_start(self):
        fn = inverse_lr(1.0, inv_gamma=1e9, power=0.5, warmup=0.999)
        assert float(fn(jnp.asarray(0))) < 0.01
        assert float(fn(jnp.asarray(5000))) > 0.9


class TestVAETraining:
    @pytest.mark.heavy  # 30 s adversarial training loop; core keeps test_dac_training_step
    def test_losses_decrease(self, rng):
        vae = AudioVAE(io_channels=1, channels=4, latent_dim=4,
                       c_mults=(1, 2), strides=(2, 4))
        disc = tiny_disc()
        step, gtx, dtx = make_codec_train_steps(
            vae, disc, codec_kind="vae", sample_rate=8000,
            gen_lr=1e-3, disc_lr=1e-3, warmup=0.0,
            stft_windows=(128, 64))
        audio = jnp.asarray(
            (0.4 * np.sin(2 * np.pi * 220 * np.arange(1024) / 8000))
            .astype(np.float32))[None, :, None].repeat(2, axis=0)
        state = init_codec_train_state(vae, disc, gtx, dtx,
                                       jax.random.PRNGKey(0), audio)
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(8):
            state, m = step(state, audio, key)
            if first is None:
                first = float(m["gen/mrstft"])
        assert float(m["gen/mrstft"]) < first
        assert np.isfinite(float(m["disc/loss"]))
        assert int(state.step) == 8

    def test_dac_training_step(self, rng):
        dac = DAC(encoder_dim=4, encoder_rates=(2, 4), latent_dim=8,
                  decoder_dim=16, decoder_rates=(4, 2), n_codebooks=2,
                  codebook_size=16, codebook_dim=4, sample_rate=8000,
                  quantizer_dropout=0.5)
        disc = tiny_disc()
        step, gtx, dtx = make_codec_train_steps(
            dac, disc, codec_kind="dac", sample_rate=8000,
            stft_windows=(128, 64), warmup=0.0)
        audio = jnp.asarray(rng.standard_normal((2, 1024, 1)).astype(np.float32)) * 0.3
        state = init_codec_train_state(dac, disc, gtx, dtx,
                                       jax.random.PRNGKey(0), audio)
        state, m = step(state, audio, jax.random.PRNGKey(2))
        for k in ("gen/loss", "gen/commitment", "gen/codebook", "disc/loss"):
            assert np.isfinite(float(m[k])), k
