"""Native C++ audio ingest tests (build + parity with the Python path)."""

import numpy as np
import pytest

from ezaudio_tpu.data import native_loader
from ezaudio_tpu.data.audio_io import save_wav

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="g++ / native build unavailable")


@pytest.fixture
def wavs(tmp_path, rng):
    sr = 8000
    paths, refs = [], []
    for i in range(4):
        x = (0.4 * rng.standard_normal(2 * sr + i * 100)).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        save_wav(p, x, sr)
        paths.append(p)
        refs.append(x)
    return paths, refs, sr


class TestNativeDecode:
    def test_float_wav_decode_matches(self, wavs):
        paths, refs, sr = wavs
        wav, got_sr = native_loader.decode_wav(paths[0])
        assert got_sr == sr
        np.testing.assert_allclose(wav, refs[0], atol=1e-6)

    def test_pcm16_decode(self, tmp_path, rng):
        sr = 8000
        # keep well inside [-1, 1]: pcm16 write clips
        x = np.clip(0.2 * rng.standard_normal(sr), -0.9, 0.9).astype(np.float32)
        p = str(tmp_path / "p16.wav")
        save_wav(p, x, sr, subtype="pcm16")
        wav, got_sr = native_loader.decode_wav(p)
        assert got_sr == sr
        np.testing.assert_allclose(wav, x, atol=1.0 / 16000)

    def test_stereo_downmix(self, tmp_path, rng):
        from scipy.io import wavfile

        sr = 8000
        st = (0.3 * rng.standard_normal((sr, 2))).astype(np.float32)
        p = str(tmp_path / "st.wav")
        wavfile.write(p, sr, st)
        wav, _ = native_loader.decode_wav(p)
        np.testing.assert_allclose(wav, st.mean(axis=1), atol=1e-6)


class TestNativeBatch:
    def test_batch_shapes_and_normalize(self, wavs):
        paths, refs, sr = wavs
        out, status = native_loader.load_batch(paths, seg_len=sr,
                                               expected_sr=sr, seed=3)
        assert (status == 0).all()
        assert out.shape == (4, sr)
        # peak-normalized crops
        peaks = np.abs(out).max(axis=1)
        np.testing.assert_allclose(peaks, 1.0, atol=1e-3)

    def test_deterministic_given_seed(self, wavs):
        paths, _, sr = wavs
        a, _ = native_loader.load_batch(paths, sr, sr, seed=11)
        b, _ = native_loader.load_batch(paths, sr, sr, seed=11)
        np.testing.assert_array_equal(a, b)
        c, _ = native_loader.load_batch(paths, sr, sr, seed=12)
        assert np.abs(a - c).max() > 0  # different crop

    def test_zero_pad_short_file(self, tmp_path, rng):
        sr = 8000
        x = (0.4 * rng.standard_normal(sr // 2)).astype(np.float32)
        p = str(tmp_path / "short.wav")
        save_wav(p, x, sr)
        out, status = native_loader.load_batch([p], sr, sr, normalize=False)
        assert status[0] == 0
        np.testing.assert_allclose(out[0, : sr // 2], x, atol=1e-6)
        assert (out[0, sr // 2 :] == 0).all()

    def test_sr_mismatch_reports_error(self, wavs):
        paths, _, sr = wavs
        _, status = native_loader.load_batch(paths[:1], sr, expected_sr=16000)
        assert status[0] == -4


class TestNativeConcurrency:
    def test_parallel_batches_stable(self, tmp_path, rng):
        """Hammer the thread pool: results must be deterministic per seed
        regardless of thread count."""
        sr = 8000
        paths = []
        for i in range(32):
            x = (0.3 * rng.standard_normal(sr + 64 * i)).astype(np.float32)
            p = str(tmp_path / f"c{i}.wav")
            save_wav(p, x, sr)
            paths.append(p)
        a, sa = native_loader.load_batch(paths, sr, sr, seed=5, n_threads=1)
        b, sb = native_loader.load_batch(paths, sr, sr, seed=5, n_threads=16)
        assert (sa == 0).all() and (sb == 0).all()
        np.testing.assert_array_equal(a, b)


class TestNativeMalformedWavs:
    def _write_wav_header(self, path, fmt, channels, bits, data=b"\x00" * 64):
        import struct

        fmt_chunk = struct.pack("<HHIIHH", fmt, channels, 8000,
                                8000 * max(channels, 1) * max(bits // 8, 1),
                                max(channels, 1) * max(bits // 8, 1), bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_chunk))
                + fmt_chunk + b"data" + struct.pack("<I", len(data)) + data)
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_zero_channels_returns_error_not_sigfpe(self, tmp_path):
        from ezaudio_tpu.data import native_loader

        lib = native_loader.get_lib()
        if lib is None:
            import pytest

            pytest.skip("no compiler")
        import ctypes

        p = str(tmp_path / "bad.wav")
        self._write_wav_header(p, fmt=1, channels=0, bits=16)
        out = np.zeros(100, np.float32)
        sr = ctypes.c_int32(0)
        n = lib.ez_decode_wav(
            p.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            100, ctypes.byref(sr))
        assert n < 0  # error status, process alive

    def test_unsupported_format_returns_error_not_silence(self, tmp_path):
        from ezaudio_tpu.data import native_loader

        lib = native_loader.get_lib()
        if lib is None:
            import pytest

            pytest.skip("no compiler")
        import ctypes

        p = str(tmp_path / "alaw.wav")
        self._write_wav_header(p, fmt=6, channels=1, bits=8)  # A-law
        out = np.zeros(100, np.float32)
        sr = ctypes.c_int32(0)
        n = lib.ez_decode_wav(
            p.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            100, ctypes.byref(sr))
        assert n < 0  # must NOT report success with zeroed audio
