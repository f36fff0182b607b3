"""Pretransform tests: PQMF reconstruction, facades, factory."""

import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.codecs.pretransforms import (
    AutoencoderPretransform, PQMFPretransform, create_pretransform_from_config)


class TestPQMF:
    def test_near_perfect_reconstruction(self, rng):
        pq = PQMFPretransform(num_bands=8, taps=124)
        sr = 16000
        t = np.arange(2 * sr) / sr
        x = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 3100 * t)).astype(np.float32)
        xin = jnp.asarray(x)[None, :, None]
        z = pq.encode(xin)
        assert z.shape == (1, len(x) // 8, 8)
        rec = np.asarray(pq.decode(z))[0, :, 0]
        # trim filter transients, compensate group delay
        d = np.argmax(np.correlate(rec, x[: sr // 2], mode="valid"))
        seg_r = rec[d : d + sr]
        seg_x = x[:sr]
        err = np.sqrt(np.mean((seg_r - seg_x) ** 2)) / np.sqrt(np.mean(seg_x**2))
        assert err < 0.05, err  # near-perfect reconstruction

    def test_band_separation(self):
        """A low tone should live in the lowest band."""
        pq = PQMFPretransform(num_bands=8, taps=124)
        sr = 16000
        t = np.arange(sr) / sr
        lo = np.sin(2 * np.pi * 300 * t).astype(np.float32)  # < sr/16
        z = np.asarray(pq.encode(jnp.asarray(lo)[None, :, None]))[0]
        energy = np.square(z).sum(axis=0)
        assert energy[0] > 0.9 * energy.sum()

    def test_factory(self):
        pt = create_pretransform_from_config(
            {"type": "pqmf", "config": {"num_bands": 4}}, 16000)
        assert pt.downsampling_ratio == 4
        assert create_pretransform_from_config(None, 16000) is None


class TestAutoencoderPretransform:
    def test_wraps_facade_with_scale(self, rng):
        class FakeFacade:
            downsampling_ratio = 2

            def encode(self, x):
                return x[:, ::2]

            def decode(self, z):
                return jnp.repeat(z, 2, axis=1)

        pt = AutoencoderPretransform(FakeFacade(), scale=2.0)
        x = jnp.asarray(rng.standard_normal((1, 8, 1)).astype(np.float32))
        z = pt.encode(x)
        np.testing.assert_allclose(np.asarray(z), np.asarray(x[:, ::2]) / 2.0)
        rec = pt.decode(z)
        assert rec.shape == (1, 8, 1)


class TestWaveletPretransform:
    def test_db4_coefficients_match_published(self):
        from ezaudio_tpu.codecs.wavelets import daubechies_filters

        lo, _ = daubechies_filters(4)
        want = [0.230377813309, 0.714846570553, 0.630880767930,
                -0.027983769417, -0.187034811719, 0.030841381836,
                0.032883011667, -0.010597401785]
        np.testing.assert_allclose(lo, want, atol=1e-9)

    def test_perfect_reconstruction_all_wavelets(self):
        from ezaudio_tpu.codecs.wavelets import (
            WaveletDecode1d, WaveletEncode1d)

        rng = np.random.default_rng(0)
        for wav in ("haar", "db2", "db4", "db8"):
            for C in (1, 2):
                enc = WaveletEncode1d(C, 3, wav)
                dec = WaveletDecode1d(C, 3, wav)
                x = jnp.asarray(
                    rng.standard_normal((2, 64, C)).astype(np.float32))
                z = enc(x)
                assert z.shape == (2, 8, C * 8)
                err = float(jnp.abs(dec(z) - x).max())
                assert err < 1e-4, (wav, C, err)

    def test_pretransform_wiring(self):
        from ezaudio_tpu.codecs.pretransforms import (
            WaveletPretransform, create_pretransform_from_config)

        p = create_pretransform_from_config(
            {"type": "wavelet",
             "config": {"channels": 1, "levels": 4, "wavelet": "db2"}},
            sample_rate=24000)
        assert isinstance(p, WaveletPretransform)
        assert p.downsampling_ratio == 16 and p.encoded_channels == 16
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 128, 1)).astype(np.float32))
        z = p.encode(x)
        assert z.shape == (1, 8, 16)
        np.testing.assert_allclose(np.asarray(p.decode(z)), np.asarray(x),
                                   atol=1e-4)

    def test_unsupported_wavelet_raises(self):
        from ezaudio_tpu.codecs.wavelets import wavelet_filters

        with np.testing.assert_raises(ValueError):
            wavelet_filters("bior4.4")


class TestPQMFLengthContract:
    def test_decode_length_is_exact(self):
        """decode must honour the documented (B, L*M, 1) length (the
        dilated conv used to come back M-1 samples short)."""
        import jax.numpy as jnp

        pq = PQMFPretransform(num_bands=8, taps=124)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 4096, 1)).astype(np.float32))
        z = pq.encode(x)
        y = pq.decode(z)
        assert z.shape == (1, 512, 8)
        assert y.shape == (1, 4096, 1), y.shape


class TestWaveletShortInput:
    def test_too_short_raises_not_corrupts(self):
        import jax.numpy as jnp
        import pytest

        from ezaudio_tpu.codecs.wavelets import (
            WaveletDecode1d, WaveletEncode1d)

        enc = WaveletEncode1d(channels=1, levels=4, wavelet="db8")  # k=16
        x = jnp.zeros((1, 64, 1))
        with pytest.raises(ValueError):
            enc(x)
        dec = WaveletDecode1d(channels=1, levels=4, wavelet="db8")
        with pytest.raises(ValueError):
            dec(jnp.zeros((1, 4, 16)))
