"""Audio utility tests: STFT/mel vs torch, metrics sanity, loudness, IO,
augmentations, tango mix, dataset."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch


class TestSTFT:
    def test_stft_matches_torch(self, rng):
        from ezaudio_tpu.audio.stft import stft

        x = rng.standard_normal((2, 4096)).astype(np.float32)
        got = np.asarray(stft(jnp.asarray(x), 512, 128))
        want = torch.stft(torch.from_numpy(x), 512, 128,
                          window=torch.hann_window(512),
                          center=True, return_complex=True).numpy()
        np.testing.assert_allclose(np.abs(got), np.abs(want), atol=1e-3)

    def test_istft_roundtrip(self, rng):
        from ezaudio_tpu.audio.stft import istft, stft

        x = rng.standard_normal((1, 2048)).astype(np.float32)
        spec = stft(jnp.asarray(x), 256, 64)
        rec = np.asarray(istft(spec, 256, 64, length=2048))
        np.testing.assert_allclose(rec, x, atol=1e-4)

    def test_mel_filterbank_shape_and_coverage(self):
        from ezaudio_tpu.audio.stft import mel_filterbank

        fb = mel_filterbank(24000, 1024, 80)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # every mel band has some support
        assert (fb.sum(axis=1) > 0).all()


class TestMetrics:
    def test_si_sdr_perfect_and_noisy(self, rng):
        from ezaudio_tpu.audio.metrics import si_sdr

        x = rng.standard_normal((2, 8000)).astype(np.float32)
        perfect = float(si_sdr(jnp.asarray(x), jnp.asarray(x)))
        assert perfect > 60
        noisy = float(si_sdr(jnp.asarray(x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)),
                             jnp.asarray(x)))
        assert 10 < noisy < 30
        scaled = float(si_sdr(jnp.asarray(3.0 * x), jnp.asarray(x)))
        assert scaled > 60  # scale-invariance

    def test_msstft_zero_for_identical(self, rng):
        from ezaudio_tpu.audio.metrics import multiscale_stft_loss

        x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
        assert float(multiscale_stft_loss(x, x)) == 0.0
        y = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
        assert float(multiscale_stft_loss(x, y)) > 0.1

    def test_mel_loss_ordering(self, rng):
        from ezaudio_tpu.audio.metrics import mel_spectrogram_loss

        x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
        near = x + 0.01 * jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
        far = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
        assert float(mel_spectrogram_loss(near, x)) < float(mel_spectrogram_loss(far, x))


class TestLoudness:
    def test_sine_loudness_ballpark(self):
        from ezaudio_tpu.audio.loudness import integrated_loudness

        sr = 48000
        t = np.arange(5 * sr) / sr
        # full-scale 1 kHz sine ~ -3.01 LKFS per BS.1770 (K-weight ~ 0 dB at 1k)
        x = np.sin(2 * np.pi * 1000 * t)
        lufs = integrated_loudness(x, sr)
        assert -4.5 < lufs < -2.0, lufs
        # -20 dB version is 20 LU quieter
        lufs2 = integrated_loudness(0.1 * x, sr)
        assert abs((lufs - lufs2) - 20) < 0.5

    def test_silence_gated(self):
        from ezaudio_tpu.audio.loudness import integrated_loudness

        assert integrated_loudness(np.zeros(48000), 48000) == -np.inf


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path, rng):
        from ezaudio_tpu.data.audio_io import load_wav, save_wav

        x = (0.5 * rng.standard_normal(8000)).astype(np.float32)
        p = str(tmp_path / "t.wav")
        save_wav(p, x, 16000)
        y, sr = load_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_pcm16_and_resample(self, tmp_path, rng):
        from ezaudio_tpu.data.audio_io import load_wav, save_wav

        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
        p = str(tmp_path / "t16.wav")
        save_wav(p, x, 16000, subtype="pcm16")
        y, sr = load_wav(p, sr=8000)
        assert sr == 8000 and abs(len(y) - 8000) <= 1


class TestWavAug:
    def test_phase180(self):
        from ezaudio_tpu.data.wav_aug import WavAugmentation

        aug = WavAugmentation({"phase180": {"p": 1.0}},
                              rng=np.random.default_rng(0))
        x = np.ones(10, np.float32)
        np.testing.assert_array_equal(aug(x), -x)

    def test_mu_law_matches_torchaudio_formula(self, rng):
        from ezaudio_tpu.data.wav_aug import mu_law_decode, mu_law_encode

        x = np.clip(rng.standard_normal(100).astype(np.float32), -1, 1)
        enc = mu_law_encode(x, 256)
        dec = mu_law_decode(enc, 256)
        assert np.abs(dec - x).max() < 0.02  # 8-bit quantization error bound

    def test_biquad_lowpass_attenuates_high_freq(self):
        from ezaudio_tpu.data.wav_aug import lowpass_biquad

        sr = 16000
        t = np.arange(sr) / sr
        hi = np.sin(2 * np.pi * 7000 * t).astype(np.float32)
        out = lowpass_biquad(hi, sr, 1000)
        assert np.square(out).mean() < 0.05 * np.square(hi).mean()


class TestTangoMix:
    def test_equal_loudness_mix_preserves_energy_scale(self, rng):
        from ezaudio_tpu.data.tango_mix import tango_audio_mix

        a = (0.5 * rng.standard_normal((1, 24000))).astype(np.float32)
        mixed = tango_audio_mix(a, a.copy(), r=0.5)
        # identical signals, r=0.5 -> t=0.5, output = a / sqrt(0.5) * ... = sqrt2/...
        np.testing.assert_allclose(mixed, a / np.sqrt(0.5), rtol=1e-4)


class TestDataset:
    def test_csv_dataset(self, tmp_path, rng):
        import pandas as pd

        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.dataset import EACaps

        sr = 8000
        rows = []
        for i in range(6):
            x = (0.3 * rng.standard_normal(2 * sr)).astype(np.float32)
            save_wav(str(tmp_path / f"{i}.wav"), x, sr)
            rows.append(dict(audio_path=f"{i}.wav", caption=f"sound {i}",
                             split="train" if i < 5 else "val",
                             audio_length=2.0, absolute_index=i,
                             fine_tune_data=True))
        pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)

        ds = EACaps(data_dir=str(tmp_path) + "/", meta_dir=str(tmp_path / "meta.csv"),
                    subset="train", seg_length=1, sr=sr,
                    aug_config={"phase180": {"p": 0.5}})
        assert len(ds) == 5
        clip, text = ds[0]
        assert clip.shape == (sr,)
        assert text == "sound 0"
        batches = list(ds.batches(2))
        assert len(batches) == 2
        assert batches[0]["audio"].shape == (2, sr)

    def test_resumable_iterator(self, tmp_path, rng):
        import pandas as pd

        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.dataset import EACaps, ResumableIterator

        sr = 8000
        rows = []
        for i in range(8):
            save_wav(str(tmp_path / f"{i}.wav"),
                     (0.3 * rng.standard_normal(sr)).astype(np.float32), sr)
            rows.append(dict(audio_path=f"{i}.wav", caption=str(i), split="train",
                             audio_length=1.0, absolute_index=i, fine_tune_data=True))
        pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
        ds = EACaps(data_dir=str(tmp_path) + "/", meta_dir=str(tmp_path / "meta.csv"),
                    subset="train", seg_length=1, sr=sr)

        it1 = ResumableIterator(ds, batch_size=2, seed=1)
        g = iter(it1)
        b1 = next(g)
        state = it1.state_dict()

        it2 = ResumableIterator(ds, batch_size=2, seed=1)
        it2.load_state_dict(state)
        b2_resumed = next(iter(it2))
        b2_direct = next(g)
        np.testing.assert_array_equal(sorted(b2_resumed["text"]), sorted(b2_direct["text"]))


class TestFrechet:
    def test_identical_distributions_near_zero(self, rng):
        from ezaudio_tpu.audio.metrics import frechet_audio_distance

        a = rng.standard_normal((200, 8))
        assert frechet_audio_distance(a, a.copy()) < 1e-6

    def test_shifted_distribution_positive(self, rng):
        from ezaudio_tpu.audio.metrics import frechet_audio_distance

        a = rng.standard_normal((200, 8))
        b = rng.standard_normal((200, 8)) + 2.0
        d = frechet_audio_distance(a, b)
        assert d > 8 * 3.0  # ~ ||diff||^2 = 8 * 4

    def test_mel_embedding_discriminates(self, rng):
        import jax.numpy as jnp

        from ezaudio_tpu.audio.metrics import (
            frechet_audio_distance, mel_statistics_embedding)

        sr = 8000
        t = np.arange(sr) / sr
        tones = np.stack([np.sin(2 * np.pi * f * t)
                          for f in rng.uniform(200, 400, 16)]).astype(np.float32)
        noise = rng.standard_normal((16, sr)).astype(np.float32) * 0.3
        e_tone = np.asarray(mel_statistics_embedding(tones, sr))
        e_noise = np.asarray(mel_statistics_embedding(noise, sr))
        d_same = frechet_audio_distance(e_tone[:8], e_tone[8:])
        d_diff = frechet_audio_distance(e_tone, e_noise)
        assert d_diff > 5 * max(d_same, 1e-3)


class TestMFCC:
    def test_shape_and_dc_term(self):
        from ezaudio_tpu.audio.signal import AudioSignal

        sr = 8000
        t = np.arange(2 * sr) / sr
        x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        sig = AudioSignal(x, sr)
        m = sig.mfcc(n_mfcc=13, n_mels=40, n_fft=512)
        assert m.shape[:3] == (1, 1, 13)
        assert np.isfinite(m).all()

    def test_matches_manual_dct_of_log_mel(self):
        from ezaudio_tpu.audio.signal import AudioSignal

        rng = np.random.default_rng(0)
        sr = 8000
        sig = AudioSignal(0.2 * rng.standard_normal(sr).astype(np.float32), sr)
        n_mfcc, n_mels = 13, 40
        mel = sig.mel_spectrogram(n_mels, 512)
        log_mel = np.log(mel + 1e-6)
        n = np.arange(n_mels)
        k = np.arange(n_mfcc)
        dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
        dct *= np.sqrt(2.0 / n_mels)
        dct[:, 0] /= np.sqrt(2.0)
        want = np.einsum("bcmt,mk->bckt", log_mel, dct)
        got = sig.mfcc(n_mfcc=n_mfcc, n_mels=n_mels, n_fft=512)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPhaseVocoder:
    def _tone(self, sr=8000, secs=2, hz=440):
        t = np.arange(secs * sr) / sr
        return np.sin(2 * np.pi * hz * t).astype(np.float32)

    def _peak(self, y, sr):
        spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
        return np.argmax(spec) * sr / y.size

    def test_time_stretch_changes_length_keeps_pitch(self):
        from ezaudio_tpu.audio.effects import time_stretch

        sr = 8000
        x = self._tone(sr)
        for rate in (0.5, 2.0):
            y = time_stretch(x, rate)
            assert abs(y.shape[-1] - int(round(x.size / rate))) <= 1
            assert abs(self._peak(y, sr) - 440) < 5

    def test_pitch_shift_moves_pitch_keeps_length(self):
        from ezaudio_tpu.audio.effects import pitch_shift

        sr = 8000
        x = self._tone(sr)
        for n in (-12, 7, 12):
            y = pitch_shift(x, sr, n)
            assert y.shape == x.shape
            want = 440 * 2 ** (n / 12)
            assert abs(self._peak(y, sr) - want) < 0.02 * want

    def test_batched_shapes(self):
        from ezaudio_tpu.audio.effects import pitch_shift, time_stretch

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 8000)).astype(np.float32)
        assert time_stretch(x, 1.25).shape == (2, 1, 6400)
        assert pitch_shift(x, 8000, 3).shape == x.shape

    def test_bad_rate_raises(self):
        from ezaudio_tpu.audio.effects import time_stretch

        with np.testing.assert_raises(ValueError):
            time_stretch(np.zeros(100, np.float32), 0.0)


class TestGenerativeMetrics:
    """KL / IS columns of the paper's metric suite (audioldm_eval
    conventions) — classifier-agnostic math on logits/probs."""

    def test_kl_zero_for_identical_logits(self, rng):
        from ezaudio_tpu.audio.metrics import paired_kl_divergence

        l = rng.standard_normal((16, 10))
        assert paired_kl_divergence(l, l) < 1e-12
        assert paired_kl_divergence(l, l, kind="sigmoid") < 1e-12

    def test_kl_positive_and_orders_by_divergence(self, rng):
        from ezaudio_tpu.audio.metrics import paired_kl_divergence

        l = rng.standard_normal((32, 10))
        near = paired_kl_divergence(l + 0.1 * rng.standard_normal((32, 10)), l)
        far = paired_kl_divergence(l + 2.0 * rng.standard_normal((32, 10)), l)
        assert 0 < near < far

    def test_kl_shape_mismatch_raises(self, rng):
        from ezaudio_tpu.audio.metrics import paired_kl_divergence

        with np.testing.assert_raises(ValueError):
            paired_kl_divergence(np.zeros((4, 10)), np.zeros((5, 10)))

    def test_inception_score_bounds(self, rng):
        from ezaudio_tpu.audio.metrics import inception_score

        # confident + diverse -> near n_classes; collapsed -> 1
        onehot = np.eye(10)[rng.integers(0, 10, 200)] * 20.0
        collapsed = np.tile(np.eye(10)[0] * 20.0, (200, 1))
        hi = inception_score(onehot)
        lo = inception_score(collapsed)
        assert abs(lo - 1.0) < 1e-9 and 4.0 < hi <= 10.0

    def test_inception_score_uniform_probs_is_one(self, rng):
        from ezaudio_tpu.audio.metrics import inception_score

        assert abs(inception_score(np.full((100, 10), 0.1)) - 1.0) < 1e-9


class TestMetricsReviewFixes:
    def test_frechet_rank_deficient_finite(self, rng):
        # fewer clips than embedding dims -> singular covariances; the
        # eps*I retry must keep the distance finite
        from ezaudio_tpu.audio.metrics import frechet_audio_distance

        a = rng.standard_normal((20, 50))
        b = rng.standard_normal((20, 50)) + 1.0
        d = frechet_audio_distance(a, b)
        assert np.isfinite(d) and d > 0

    def test_mel_loss_broadcasts_default_fmin(self, rng):
        # 3 scales with the length-2 default fmin must not silently drop
        # the third scale
        import jax.numpy as jnp

        from ezaudio_tpu.audio.metrics import mel_spectrogram_loss

        x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
        kw = dict(sr=16000, n_mels=(80, 40, 20),
                  window_lengths=(1024, 512, 256))
        got = mel_spectrogram_loss(x, y, **kw)
        want = mel_spectrogram_loss(x, y, fmin=(0.0, 0.0, 0.0), **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_mel_loss_mismatched_lists_raise(self, rng):
        import jax.numpy as jnp

        from ezaudio_tpu.audio.metrics import mel_spectrogram_loss

        x = jnp.zeros((1, 2048))
        with np.testing.assert_raises(ValueError):
            mel_spectrogram_loss(x, x, n_mels=(80, 40, 20),
                                 window_lengths=(1024, 512))
