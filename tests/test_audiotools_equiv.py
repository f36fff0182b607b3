"""Tests for the audiotools-equivalent layer: AudioSignal, effects,
transforms, tracker, experiment."""

import os

import numpy as np
import pytest

from ezaudio_tpu.audio.signal import AudioSignal


@pytest.fixture
def sine(tmp_path):
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "sine.wav")
    AudioSignal(x, sr).write(path)
    return path, x, sr


class TestAudioSignal:
    def test_load_and_props(self, sine):
        path, x, sr = sine
        sig = AudioSignal.load(path)
        assert sig.sample_rate == sr
        assert sig.batch_size == 1 and sig.num_channels == 1
        assert abs(sig.signal_duration - 2.0) < 1e-3

    def test_excerpt_fixed_length(self, sine):
        path, _, sr = sine
        ex = AudioSignal.excerpt(path, 0.5, state=np.random.default_rng(0))
        assert ex.signal_length == sr // 2

    def test_salient_excerpt_prefers_loud(self, tmp_path):
        sr = 8000
        x = np.zeros(4 * sr, np.float32)
        x[2 * sr : 3 * sr] = 0.5 * np.sin(
            2 * np.pi * 220 * np.arange(sr) / sr)
        p = str(tmp_path / "sparse.wav")
        AudioSignal(x, sr).write(p)
        ex = AudioSignal.salient_excerpt(p, 0.5, loudness_cutoff=-30,
                                         state=np.random.default_rng(0))
        assert np.abs(ex.audio_data).max() > 0.1

    def test_resample_and_pad(self, sine):
        path, _, sr = sine
        sig = AudioSignal.load(path).resample(4000)
        assert sig.sample_rate == 4000 and abs(sig.signal_length - 8000) <= 1
        sig.zero_pad_to(10000)
        assert sig.signal_length == 10000

    def test_normalize_loudness(self, sine):
        path, _, _ = sine
        sig = AudioSignal.load(path).normalize(-30)
        assert abs(sig.loudness() - (-30)) < 1.0

    def test_stft_mel_shapes(self, sine):
        path, _, sr = sine
        sig = AudioSignal.load(path)
        spec = sig.stft(512, 128)
        assert spec.shape[:2] == (1, 1) and spec.shape[2] == 257
        mel = sig.mel_spectrogram(40, 512, 128)
        assert mel.shape[2] == 40

    def test_batch_collate(self, sine):
        path, _, sr = sine
        a = AudioSignal.load(path)
        b = AudioSignal.load(path).truncate_samples(5000)
        batch = AudioSignal.batch([a, b])
        assert batch.batch_size == 2
        assert batch.signal_length == a.signal_length


class TestEffects:
    def test_mix_at_snr(self):
        from ezaudio_tpu.audio.effects import mix

        sr = 8000
        t = np.arange(4 * sr) / sr
        sig = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
        noise = np.random.default_rng(0).standard_normal(len(t)).astype(np.float32)
        mixed = mix(sig, noise, sr, snr=20.0)
        resid = mixed - sig
        snr_measured = 10 * np.log10(np.square(sig).mean() / np.square(resid).mean())
        assert 14 < snr_measured < 26  # loudness-based, so approximate

    def test_apply_ir_identity(self):
        from ezaudio_tpu.audio.effects import apply_ir

        x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
        ir = np.zeros(64, np.float32)
        ir[0] = 1.0
        np.testing.assert_allclose(apply_ir(x, ir), x, atol=1e-5)

    def test_preemphasis(self):
        from ezaudio_tpu.audio.effects import preemphasis

        x = np.ones(10, np.float32)
        y = preemphasis(x, 0.85)
        assert y[0] == 1.0 and abs(y[1] - 0.15) < 1e-6

    def test_equalizer_attenuates_band(self):
        from ezaudio_tpu.audio.effects import equalizer

        sr = 8000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        gains = np.zeros(6)
        gains[-2:] = -40  # kill top mel bands (3 kHz at sr 8000 is high)
        y = equalizer(x, sr, gains)
        assert np.square(y).mean() < 0.3 * np.square(x).mean()


class TestTransforms:
    def test_compose_deterministic(self, sine):
        from ezaudio_tpu.data.transforms import Compose, LowPass, VolumeChange

        path, _, _ = sine
        tfm = Compose([VolumeChange(db=(-6, -6)), LowPass(cutoff=(1000, 1000))])
        s1 = tfm(AudioSignal.load(path), np.random.default_rng(7))
        s2 = tfm(AudioSignal.load(path), np.random.default_rng(7))
        np.testing.assert_array_equal(s1.audio_data, s2.audio_data)

    def test_choose_selects_one(self, sine):
        from ezaudio_tpu.data.transforms import Choose, Identity, VolumeChange

        path, _, _ = sine
        tfm = Choose([Identity(), VolumeChange(db=(-20, -20))], weights=[0, 1])
        sig = AudioSignal.load(path)
        peak0 = np.abs(sig.audio_data).max()
        out = tfm(sig, np.random.default_rng(0))
        assert abs(np.abs(out.audio_data).max() / peak0 - 10 ** (-1)) < 1e-3

    def test_prob_zero_never_applies(self, sine):
        from ezaudio_tpu.data.transforms import VolumeChange

        path, _, _ = sine
        tfm = VolumeChange(db=(-20, -20), prob=0.0)
        sig = AudioSignal.load(path)
        before = sig.audio_data.copy()
        out = tfm(sig, np.random.default_rng(0))
        np.testing.assert_array_equal(out.audio_data, before)


class TestTracker:
    def test_metrics_and_best(self, tmp_path):
        from ezaudio_tpu.training.tracker import Tracker, timer

        tr = Tracker(log_file=str(tmp_path / "m.jsonl"))
        tr.update("train", {"loss": 1.0})
        tr.update("train", {"loss": 0.5})
        assert tr.mean("train/loss") == 0.75
        assert tr.is_best("train/loss")
        tr.update("train", {"loss": 10.0})
        assert not tr.is_best("train/loss")
        with timer(tr, "step"):
            pass
        rec = tr.log(step=1)
        assert "train/loss" in rec
        assert os.path.exists(tmp_path / "m.jsonl")

        state = tr.state_dict()
        tr2 = Tracker()
        tr2.load_state_dict(state)
        assert tr2.best == tr.best

    def test_experiment_rundir(self, tmp_path):
        from ezaudio_tpu.training.tracker import Experiment

        exp = Experiment(str(tmp_path / "runs"), seed=0)
        with exp() as d:
            assert os.getcwd() == os.path.realpath(d) or os.getcwd() == d
        assert os.path.isdir(exp.exp_dir)


class TestSpectralTransforms:
    def _sig(self, rng):
        sr = 8000
        x = (0.3 * rng.standard_normal(2 * sr)).astype(np.float32)
        return AudioSignal(x, sr)

    def test_frequency_mask_removes_band(self):
        from ezaudio_tpu.data.transforms import FrequencyMask

        rng = np.random.default_rng(0)
        sr = 8000
        t = np.arange(2 * sr) / sr
        x = np.sin(2 * np.pi * 2000 * t).astype(np.float32)
        tfm = FrequencyMask(f_center=(0.5, 0.5), f_width=(0.4, 0.4))
        out = tfm(AudioSignal(x, sr), rng)  # 2 kHz = bin 0.5*nyquist
        assert np.square(out.audio_data).mean() < 0.1 * np.square(x).mean()

    def test_time_mask_zeroes_segment(self):
        from ezaudio_tpu.data.transforms import TimeMask

        rng = np.random.default_rng(0)
        sig = self._sig(rng)
        e0 = np.square(sig.audio_data).mean()
        out = TimeMask(t_center=(0.5, 0.5), t_width=(0.5, 0.5))(sig, rng)
        assert np.square(out.audio_data).mean() < 0.8 * e0

    def test_shift_phase_alters_waveform_keeps_energy(self):
        from ezaudio_tpu.data.transforms import ShiftPhase

        rng = np.random.default_rng(0)
        sig = self._sig(rng)
        ref = sig.audio_data.copy()
        out = ShiftPhase(shift=(1.5, 1.5))(sig, rng)
        assert np.abs(out.audio_data - ref).max() > 1e-3
        # energy within a factor ~2 (overlap-add resynthesis of an
        # inconsistent STFT is not magnitude-exact)
        r = np.square(out.audio_data).mean() / np.square(ref).mean()
        assert 0.3 < r < 2.0

    def test_silence(self):
        from ezaudio_tpu.data.transforms import Silence

        rng = np.random.default_rng(0)
        out = Silence()(self._sig(rng), rng)
        assert (out.audio_data == 0).all()

    def test_smoothing_reduces_high_freq(self):
        from ezaudio_tpu.data.transforms import Smoothing

        rng = np.random.default_rng(0)
        sig = self._sig(rng)
        out = Smoothing(window_len=(32, 33))(sig.clone(), rng)
        # smoothed signal has less energy in noise
        assert np.square(np.diff(out.audio_data)).mean() < \
            np.square(np.diff(sig.audio_data)).mean()


class TestRound2Transforms:
    """The remaining audiotools transforms (VERDICT r1 missing #1):
    RepeatUpTo, Equalizer, NoiseFloor, CrossTalk, GlobalVolumeNorm,
    RescaleAudio, MaskLowMagnitudes, TimeNoise, FrequencyNoise,
    SpectralDenoising."""

    def _sig(self, rng, sr=8000, secs=2, scale=0.3):
        x = (scale * rng.standard_normal(secs * sr)).astype(np.float32)
        return AudioSignal(x, sr)

    def test_repeat_up_to_applies_between_1_and_max(self):
        from ezaudio_tpu.data.transforms import RepeatUpTo, VolumeChange

        rng = np.random.default_rng(3)
        tfm = RepeatUpTo(VolumeChange(db=(-6, -6)), max_repeat=4)
        sig = self._sig(np.random.default_rng(0))
        peak0 = np.abs(sig.audio_data).max()
        out = tfm(sig, rng)
        ratio = np.abs(out.audio_data).max() / peak0
        n = round(20 * np.log10(ratio) / -6)
        assert 1 <= n <= 3, n  # max_repeat=4 -> 1..3 applications

    def test_equalizer_transform_cuts(self):
        from ezaudio_tpu.data.transforms import Equalizer

        rng = np.random.default_rng(0)
        sig = self._sig(rng)
        e0 = np.square(sig.audio_data).mean()
        out = Equalizer(eq_amount=40.0, n_bands=6)(sig, rng)
        assert np.square(out.audio_data).mean() < e0  # only cuts, never boosts

    def test_noise_floor_adds_noise_at_level(self):
        from ezaudio_tpu.data.transforms import NoiseFloor

        rng = np.random.default_rng(0)
        sr = 8000
        sig = AudioSignal(np.zeros(2 * sr, np.float32), sr)
        out = NoiseFloor(db=(-50, -50))(sig, rng)
        assert np.abs(out.audio_data).max() > 0
        got = out.loudness()
        assert abs(got - (-50.0)) < 3.0, got

    def test_crosstalk_preserves_loudness(self):
        from ezaudio_tpu.data.transforms import CrossTalk

        rng = np.random.default_rng(0)
        sr = 8000
        t = np.arange(2 * sr) / sr
        sig = AudioSignal(0.3 * np.sin(2 * np.pi * 440 * t).astype(np.float32), sr)
        l0 = sig.loudness()
        out = CrossTalk(snr=(5, 5))(sig.clone(), rng)
        assert np.abs(out.audio_data - sig.audio_data).max() > 1e-4
        assert abs(out.loudness() - l0) < 1.0

    def test_global_volume_norm_uses_metadata(self):
        from ezaudio_tpu.data.transforms import GlobalVolumeNorm

        rng = np.random.default_rng(0)
        sig = self._sig(rng)
        sig.metadata["loudness"] = -30.0
        before = sig.audio_data.copy()
        out = GlobalVolumeNorm(db=(-24, -24))(sig, rng)
        # gain = -24 - (-30) = +6 dB ~ x1.995
        np.testing.assert_allclose(
            out.audio_data, before * 10 ** (6 / 20), rtol=1e-5)
        # no metadata -> no-op
        sig2 = self._sig(np.random.default_rng(1))
        before2 = sig2.audio_data.copy()
        out2 = GlobalVolumeNorm(db=(-24, -24))(sig2, rng)
        np.testing.assert_array_equal(out2.audio_data, before2)

    def test_rescale_audio_only_when_clipping(self):
        from ezaudio_tpu.data.transforms import RescaleAudio

        rng = np.random.default_rng(0)
        loud = AudioSignal(np.array([0.0, 2.0, -4.0], np.float32), 8000)
        out = RescaleAudio(val=1.0)(loud, rng)
        assert np.abs(out.audio_data).max() <= 1.0 + 1e-6
        quiet = AudioSignal(np.array([0.0, 0.5, -0.25], np.float32), 8000)
        before = quiet.audio_data.copy()
        out = RescaleAudio(val=1.0)(quiet, rng)
        np.testing.assert_array_equal(out.audio_data, before)

    def test_mask_low_magnitudes_drops_quiet_bins(self):
        from ezaudio_tpu.data.transforms import MaskLowMagnitudes

        rng = np.random.default_rng(0)
        sr = 8000
        t = np.arange(2 * sr) / sr
        # loud tone + quiet broadband noise
        x = (np.sin(2 * np.pi * 1000 * t)
             + 1e-3 * rng.standard_normal(t.size)).astype(np.float32)
        sig = AudioSignal(x, sr)
        out = MaskLowMagnitudes(db_cutoff=(-40, -40))(sig, rng)
        # tone survives; total energy close to original (noise floor gone)
        assert np.square(out.audio_data).mean() > 0.3
        spec = np.abs(np.fft.rfft(out.audio_data[0, 0]))
        tone_bin = int(1000 / (sr / 2) * (spec.size - 1))
        assert spec[tone_bin - 5 : tone_bin + 5].max() > 0.5 * spec.max()

    def test_time_noise_fills_with_noise(self):
        from ezaudio_tpu.data.transforms import TimeNoise

        rng = np.random.default_rng(0)
        sr = 8000
        sig = AudioSignal(np.zeros(2 * sr, np.float32), sr)
        out = TimeNoise(t_center=(0.5, 0.5), t_width=(0.5, 0.5))(sig, rng)
        T = out.audio_data.shape[-1]
        mid = np.square(out.audio_data[..., T // 2 - 400 : T // 2 + 400]).mean()
        edge = np.square(out.audio_data[..., : T // 8]).mean()
        assert mid > 10 * max(edge, 1e-12)

    def test_frequency_noise_fills_band(self):
        from ezaudio_tpu.data.transforms import FrequencyNoise

        rng = np.random.default_rng(0)
        sr = 8000
        sig = AudioSignal(np.zeros(2 * sr, np.float32), sr)
        out = FrequencyNoise(f_center=(0.5, 0.5), f_width=(0.2, 0.2))(sig, rng)
        spec = np.abs(np.fft.rfft(out.audio_data[0, 0]))
        F = spec.size
        band = spec[int(0.42 * F) : int(0.58 * F)].mean()
        outside = spec[: int(0.3 * F)].mean()
        assert band > 10 * max(outside, 1e-12)

    def test_spectral_denoising_reduces_noise_keeps_tone(self):
        from ezaudio_tpu.data.transforms import SpectralDenoising

        rng = np.random.default_rng(0)
        sr = 8000
        t = np.arange(2 * sr) / sr
        tone = 0.5 * np.sin(2 * np.pi * 500 * t)
        noise = 0.01 * rng.standard_normal(t.size)
        sig = AudioSignal((tone + noise).astype(np.float32), sr)
        out = SpectralDenoising(nz_volume=-40)(sig.clone(), rng)
        # tone energy mostly preserved
        assert np.square(out.audio_data).mean() > 0.05
        # high band (no tone content) attenuated vs input
        spec_in = np.abs(np.fft.rfft(sig.audio_data[0, 0]))
        spec_out = np.abs(np.fft.rfft(out.audio_data[0, 0]))
        F = spec_in.size
        hi_in = spec_in[int(0.7 * F):].mean()
        hi_out = spec_out[int(0.7 * F):].mean()
        assert hi_out < hi_in

    def test_spectral_gate_removes_stationary_noise(self):
        from ezaudio_tpu.data.transforms import spectral_gate

        rng = np.random.default_rng(0)
        sr = 8000
        t = np.arange(2 * sr) / sr
        tone = 0.5 * np.sin(2 * np.pi * 500 * t)
        nz = 0.02 * rng.standard_normal(t.size)
        profile = (0.02 * rng.standard_normal(sr)).astype(np.float32)[None, None, :]

        # a noise-only signal matching the profile is gated to near-silence
        noise_only = nz.astype(np.float32)[None, None, :]
        out_nz = spectral_gate(noise_only, sr, profile, denoise_amount=1.0)
        assert np.square(out_nz).mean() < 0.1 * np.square(noise_only).mean()

        # a loud tone survives (smoothing costs some energy, as in the
        # reference's SpectralGate — but most of the tone remains)
        noisy = (tone + nz).astype(np.float32)[None, None, :]
        out = spectral_gate(noisy, sr, profile, denoise_amount=1.0)
        assert np.square(out).mean() > 0.25 * np.square(tone).mean()


class TestSignalArithmeticAndCodec:
    def _sig(self, v, sr=8000):
        return AudioSignal(np.full(100, v, np.float32), sr)

    def test_arithmetic_surface(self):
        a, b = self._sig(0.5), self._sig(0.25)
        assert np.allclose((a + b).audio_data, 0.75)
        assert np.allclose((a - b).audio_data, 0.25)
        assert np.allclose((-a).audio_data, -0.5)
        assert np.allclose((a * 2).audio_data, 1.0)
        assert np.allclose((2 * a).audio_data, 1.0)
        assert np.allclose((a / b).audio_data, 2.0)
        a2 = self._sig(0.5)
        a2 += b
        assert np.allclose(a2.audio_data, 0.75)
        assert len(a) == 1
        assert a == self._sig(0.5)
        assert not (a == b)
        # originals untouched by the out-of-place ops
        assert np.allclose(a.audio_data, 0.5)

    def test_apply_codec_presets(self):
        from ezaudio_tpu.audio.effects import apply_codec

        sr = 16000
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
        gsm = apply_codec(x, sr, "GSM-FR")
        assert gsm.shape == x.shape
        # the 6 kHz component must be gone after the 3.4 kHz telephony chain
        spec = np.abs(np.fft.rfft(gsm))
        hi_bin = int(6000 / (sr / 2) * (spec.size - 1))
        lo_bin = int(440 / (sr / 2) * (spec.size - 1))
        assert spec[hi_bin - 3 : hi_bin + 3].max() < 0.05 * spec[lo_bin]
        # 8-bit mu-law keeps shape but quantizes
        eight = apply_codec(x, sr, "8-bit")
        assert 0 < np.abs(eight - x).max() < 0.05
        with np.testing.assert_raises(ValueError):
            apply_codec(x, sr, "flac")

    def test_signal_apply_codec_method(self):
        sr = 8000
        sig = AudioSignal(
            np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32), sr)
        before = sig.audio_data.copy()
        out = sig.apply_codec("8-bit")
        assert out is sig and not np.array_equal(sig.audio_data, before)


class TestSpectralGatePerChannel:
    def test_per_channel_noise_profile(self):
        """A stereo noise profile must gate each channel with ITS OWN
        statistics: with a hot right-channel profile, right-channel noise
        at that level is removed while the same-level left-channel TONE
        (well above the quiet left profile) survives."""
        from ezaudio_tpu.data.transforms import spectral_gate

        rng = np.random.default_rng(1)
        sr = 8000
        T = 2 * sr
        quiet = 0.001 * rng.standard_normal(sr)
        loud = 0.2 * rng.standard_normal(sr)
        profile = np.stack([quiet, loud])[None].astype(np.float32)  # (1,2,sr)

        t = np.arange(T) / sr
        tone = (0.2 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        hot_noise = (0.2 * rng.standard_normal(T)).astype(np.float32)
        audio = np.stack([tone, hot_noise])[None]  # (1, 2, T)

        out = spectral_gate(audio, sr, profile, denoise_amount=1.0)
        # right channel: noise at the profile's own level -> mostly gated
        assert np.square(out[0, 1]).mean() < 0.3 * np.square(hot_noise).mean()
        # left channel: tone is ~46 dB above ITS quiet profile -> survives
        # (the old [:1] broadcast used the LEFT threshold for both channels
        # and kept the right-channel noise; per-channel stats fix that)
        assert np.square(out[0, 0]).mean() > 0.25 * np.square(tone).mean()


class TestTransformReviewFixes:
    def test_background_noise_varies_across_draws(self):
        """The white-noise fallback must draw from the per-call seed, not
        a fixed Generator(0)."""
        from ezaudio_tpu.data.transforms import BackgroundNoise

        sr = 8000
        tfm = BackgroundNoise(snr=(10, 10))
        rng = np.random.default_rng(0)
        base = AudioSignal(np.zeros(sr, np.float32) + 1e-4, sr)
        out1 = tfm(base.clone(), rng)
        out2 = tfm(base.clone(), rng)
        assert np.abs(out1.audio_data - out2.audio_data).max() > 1e-6
        # and reproducible under an identical generator state
        out3 = tfm(base.clone(), np.random.default_rng(0))
        out4 = tfm(base.clone(), np.random.default_rng(0))
        np.testing.assert_array_equal(out3.audio_data, out4.audio_data)

    def test_crosstalk_source_odd_length(self, tmp_path):
        """Excerpt duration round-trips used to come back one sample short
        and crash the broadcast for odd lengths."""
        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.transforms import CrossTalk

        sr = 44100
        rng = np.random.default_rng(0)
        src = str(tmp_path / "talker.wav")
        save_wav(src, (0.2 * rng.standard_normal(3 * sr)).astype(np.float32), sr)
        x = (0.3 * rng.standard_normal(132299)).astype(np.float32)  # odd
        sig = AudioSignal(x, sr)
        out = CrossTalk(snr=(5, 5), sources=[src])(sig, rng)
        assert out.audio_data.shape[-1] == 132299
        assert np.isfinite(out.audio_data).all()

    def test_background_noise_source_odd_length(self, tmp_path):
        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.transforms import BackgroundNoise

        sr = 44100
        rng = np.random.default_rng(0)
        src = str(tmp_path / "noise.wav")
        save_wav(src, (0.2 * rng.standard_normal(3 * sr)).astype(np.float32), sr)
        sig = AudioSignal((0.3 * rng.standard_normal(132299)).astype(np.float32), sr)
        out = BackgroundNoise(snr=(10, 10), sources=[src])(sig, rng)
        assert out.audio_data.shape[-1] == 132299


class TestThirdReviewBatch:
    def test_apply_ir_batched_signal_1d_ir(self):
        """(B, C, T) signal with a 1-D IR must convolve along time only
        (fftconvolve needs axes=-1 + broadcastable ndim)."""
        from ezaudio_tpu.audio import effects

        rng = np.random.default_rng(0)
        sig = rng.standard_normal((2, 1, 1000)).astype(np.float32)
        ir = np.zeros(64, np.float32)
        ir[0] = 1.0  # identity IR
        out = effects.apply_ir(sig, ir)
        assert out.shape == sig.shape
        np.testing.assert_allclose(out, sig, atol=1e-5)
        # a delayed unit impulse is undone by the peak alignment, and the
        # batch items stay unmixed
        ir2 = np.zeros(64, np.float32)
        ir2[10] = 1.0
        out2 = effects.apply_ir(sig, ir2)
        np.testing.assert_allclose(out2, sig, atol=1e-5)

    def test_room_impulse_response_transform(self, tmp_path):
        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.transforms import RoomImpulseResponse

        sr = 8000
        rng = np.random.default_rng(0)
        ir = np.zeros(256, np.float32)
        ir[0], ir[100] = 1.0, 0.5
        save_wav(str(tmp_path / "ir.wav"), ir, sr)
        sig = AudioSignal((0.3 * rng.standard_normal(sr)).astype(np.float32), sr)
        out = RoomImpulseResponse(sources=[str(tmp_path / "ir.wav")])(sig, rng)
        assert out.audio_data.shape[-1] == sr
        assert np.isfinite(out.audio_data).all()

    def test_batched_normalize_per_item(self):
        quiet = 0.01 * np.sin(2 * np.pi * 440 * np.arange(48000) / 48000)
        loud = 0.8 * np.sin(2 * np.pi * 440 * np.arange(48000) / 48000)
        batch = AudioSignal.batch([
            AudioSignal(quiet.astype(np.float32), 48000),
            AudioSignal(loud.astype(np.float32), 48000)]).normalize(-24)
        lufs = batch.loudness()
        assert len(lufs) == 2
        np.testing.assert_allclose(lufs, -24.0, atol=1.0)
