"""Non-wav decode/encode through the native libavcodec bridge.

Closes the reference's last format gap (audiotools/core/ffmpeg.py:87-204
loads mp3/flac/anything by forking the ffmpeg binary; its own example
assets are mp3: /root/reference/egs/reference*.mp3).  Validation:

  * the reference's shipped mp3s decode with header-consistent
    duration/rate, finite non-silent samples, and a plausible spectrum
    (192 kbps mp3 has no energy near Nyquist);
  * cross-decoder parity against libmpg123 — an INDEPENDENT system
    decoder bound via ctypes — on the reference's own asset;
  * lossless FLAC roundtrip (bit-exact at s16 grid);
  * lossy mp3 roundtrip (delay-aligned correlation);
  * the product surfaces: AudioSignal.load/write, ffmpeg_load,
    load_wav(sr=...) resample-on-load.
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from ezaudio_tpu.data import codec_loader

REF_MP3S = [f"/root/reference/egs/reference{s}.mp3" for s in ("", "2", "3")]

pytestmark = pytest.mark.skipif(
    not codec_loader.available(), reason="native codec bridge unavailable")


class TestReferenceAssets:
    """The reference's own example files must load without ffmpeg."""

    @pytest.mark.parametrize("path", [p for p in REF_MP3S if os.path.exists(p)])
    def test_decode_reference_mp3(self, path):
        sr_probe, ch, dur = codec_loader.probe(path)
        wav, sr = codec_loader.decode(path)
        assert sr == sr_probe == 44100
        assert ch == 2
        # CBR header estimate vs decoded length (mp3 granule padding ~1
        # frame): within 2%
        assert abs(len(wav) / sr - dur) < max(0.02 * dur, 0.1)
        assert np.isfinite(wav).all()
        rms = float(np.sqrt((wav ** 2).mean()))
        assert 1e-3 < rms < 1.0, rms
        # spectral plausibility: 192 kbps mp3 is lowpassed well below
        # Nyquist — the top 1 kHz band must carry (relatively) nothing,
        # while garbage (desynced/huffman-broken) decode is spectrally flat
        spec = np.abs(np.fft.rfft(wav[: 1 << 17].astype(np.float64))) ** 2
        freqs = np.fft.rfftfreq(1 << 17, 1 / sr)
        top = spec[freqs > 21000].mean()
        mid = spec[(freqs > 100) & (freqs < 8000)].mean()
        assert top < 1e-3 * mid, (top, mid)

    def test_audiosignal_load_mp3(self):
        from ezaudio_tpu.audio.signal import AudioSignal

        path = REF_MP3S[0]
        sig = AudioSignal.load(path)
        assert sig.sample_rate == 44100
        assert sig.num_channels == 2
        assert 8.0 < sig.signal_duration < 11.0
        # resample-on-load (the reference's ffmpeg -ar path)
        sig24 = AudioSignal.load(path, sr=24000)
        assert sig24.sample_rate == 24000
        assert abs(sig24.signal_duration - sig.signal_duration) < 0.01

    def test_ffmpeg_load_routes_to_bridge(self):
        from ezaudio_tpu.audio.external import ffmpeg_load

        wav, sr = ffmpeg_load(REF_MP3S[0], sr=16000)
        assert sr == 16000
        assert wav.ndim == 1 and np.isfinite(wav).all()
        assert float(np.abs(wav).max()) > 1e-2


class TestMpg123Oracle:
    """Cross-decoder parity: libavcodec (ours) vs libmpg123 (independent
    system decoder).  Two unrelated implementations agreeing on the same
    bitstream is the strongest correctness evidence available in a
    zero-egress image (bit-exactness vs the ffmpeg CLI is untestable)."""

    @staticmethod
    def _mpg123_decode(path):
        name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            pytest.skip("libmpg123 not present")
        lib.mpg123_init()
        lib.mpg123_new.restype = ctypes.c_void_p
        err = ctypes.c_int(0)
        h = ctypes.c_void_p(lib.mpg123_new(None, ctypes.byref(err)))
        assert h.value, err.value
        assert lib.mpg123_open(h, path.encode()) == 0
        rate = ctypes.c_long(0)
        ch = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        assert lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch),
                                    ctypes.byref(enc)) == 0
        assert enc.value == 0xD0, hex(enc.value)  # MPG123_ENC_SIGNED_16
        chunks = []
        buf = (ctypes.c_char * (1 << 18))()
        done = ctypes.c_size_t(0)
        while True:
            ret = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(np.frombuffer(
                    buf.raw[: done.value], np.int16).astype(np.float32)
                    / 32768.0)
            if ret != 0:  # MPG123_DONE(-12) / error; MPG123_OK loops
                break
        lib.mpg123_close(h)
        lib.mpg123_delete(h)
        pcm = np.concatenate(chunks).reshape(-1, ch.value)
        return pcm.mean(axis=1), int(rate.value)

    def test_parity_on_reference_asset(self):
        ours, sr_a = codec_loader.decode(REF_MP3S[0])
        theirs, sr_b = self._mpg123_decode(REF_MP3S[0])
        assert sr_a == sr_b
        # decoders may disagree on leading delay trim (gapless handling):
        # align by cross-correlation of the first seconds
        n = min(len(ours), len(theirs), 4 * sr_a)
        corr = np.correlate(ours[:n], theirs[: n // 2], mode="valid")
        lag = int(np.argmax(corr))
        m = min(len(ours) - lag, len(theirs))
        a, b = ours[lag : lag + m], theirs[:m]
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        rho = float(np.dot(a, b) / denom)
        assert rho > 0.9999, rho
        # amplitude-accurate too, not just correlated (s16 oracle grid)
        assert float(np.abs(a - b).max()) < 5e-3


class TestRoundtrips:
    def test_flac_lossless_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        # s16-grid signal: FLAC must reproduce it exactly
        q = rng.integers(-12000, 12000, size=(22050, 2), dtype=np.int32)
        x = (q / 32768.0).astype(np.float32)
        path = str(tmp_path / "t.flac")
        codec_loader.encode(path, x, 22050)
        y, sr = codec_loader.decode(path, mono=False)
        assert sr == 22050
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1.0 / 32768.0)

    def test_mp3_encode_decode_roundtrip(self, tmp_path):
        sr = 44100
        t = np.arange(2 * sr) / sr
        x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                      0.5 * np.sin(2 * np.pi * 554 * t)], axis=1)
        x = (x * np.minimum(t * 20, 1.0)[:, None]).astype(np.float32)
        path = str(tmp_path / "t.mp3")
        codec_loader.encode(path, x, sr, bitrate=192000)
        y, sr2 = codec_loader.decode(path, mono=False)
        assert sr2 == sr
        # lossy + codec delay: align mono mixes, then correlate
        xm, ym = x.mean(1), y.mean(1)
        corr = np.correlate(ym[: 4 * sr], xm[: sr], mode="valid")
        lag = int(np.argmax(corr))
        m = min(len(ym) - lag, len(xm))
        rho = float(np.dot(ym[lag : lag + m], xm[:m])
                    / (np.linalg.norm(ym[lag : lag + m])
                       * np.linalg.norm(xm[:m])))
        assert rho > 0.99, rho

    def test_audiosignal_write_mp3_flac(self, tmp_path):
        from ezaudio_tpu.audio.signal import AudioSignal

        sr = 22050
        t = np.arange(sr) / sr
        x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        sig = AudioSignal(x, sr)
        for ext in ("mp3", "flac"):
            path = str(tmp_path / f"s.{ext}")
            sig.write(path)
            back = AudioSignal.load(path)
            assert back.sample_rate == sr
            assert abs(back.signal_duration - 1.0) < 0.1
            assert float(np.abs(back.audio_data).max()) > 0.2

    def test_dataset_ingests_mp3(self, tmp_path):
        """Training ingest with compressed files in the manifest: the
        native wav batch loader reports -3 for non-RIFF and the dataset
        falls back per-item through the codec bridge (the reference's
        DataLoader reads anything via torchaudio/ffmpeg)."""
        import pandas as pd

        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.dataset import EACaps

        sr = 16000
        rng = np.random.default_rng(0)
        rows = []
        for i in range(4):
            t = np.arange(2 * sr) / sr
            x = (0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                 + 0.01 * rng.standard_normal(2 * sr)).astype(np.float32)
            name = f"{i}.mp3" if i % 2 else f"{i}.wav"
            if name.endswith(".mp3"):
                codec_loader.encode(str(tmp_path / name), x[:, None], sr)
            else:
                save_wav(str(tmp_path / name), x, sr)
            rows.append(dict(audio_path=name, caption=f"tone {i}",
                             split="train", audio_length=2.0,
                             absolute_index=i, fine_tune_data=True))
        pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
        ds = EACaps(data_dir=str(tmp_path) + "/",
                    meta_dir=str(tmp_path / "meta.csv"),
                    subset="train", seg_length=1, sr=sr)
        (batch,) = list(ds.batches(4))
        assert batch["audio"].shape == (4, sr)
        # every row decoded to real audio, wav and mp3 alike
        assert (np.abs(batch["audio"]).max(axis=1) > 0.1).all()

    def test_ogg_vorbis_roundtrip(self, tmp_path):
        sr = 16000
        t = np.arange(sr) / sr
        x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[:, None]
        path = str(tmp_path / "t.ogg")
        codec_loader.encode(path, x, sr)
        y, sr2 = codec_loader.decode(path, mono=False)
        assert sr2 == sr
        assert abs(len(y) - len(x)) < sr // 4
        assert float(np.abs(y).max()) > 0.2
