"""Tests: CFG wrappers, manifest builder, multi-source dataset, model IO,
demo CLI arg parsing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.data.audio_io import save_wav


class TestCFGWrappers:
    def test_embedding_cfg_drop(self, rng):
        from ezaudio_tpu.models.cfg_wrappers import EmbeddingCFG

        m = EmbeddingCFG(in_channels=8)
        cond = jnp.asarray(rng.standard_normal((4, 5, 8)).astype(np.float32))
        mask = jnp.ones((4, 5), bool)
        v = m.init({"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
                   cond, mask, 1.0)
        out, om = m.apply(v, cond, mask, 1.0,
                          rngs={"cfg": jax.random.PRNGKey(2)})
        # everything dropped at prob 1: rows equal the null embedding
        null = v["params"]["cfg_embedding"]
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(null), atol=1e-6)
        assert np.asarray(om)[:, 0].all() and not np.asarray(om)[:, 1:].any()
        # inference (cfg_prob=0, the reference's gate): passthrough
        out2, om2 = m.apply(v, cond, mask, 0.0)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(cond))

    def test_discrete_cfg(self, rng):
        from ezaudio_tpu.models.cfg_wrappers import DiscreteCFG

        m = DiscreteCFG(replace_id=2)
        ids = jnp.asarray(rng.integers(3, 100, (4, 6)), jnp.int32)
        v = m.init({"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
                   ids, None, 1.0)
        out, _ = m.apply(v, ids, None, 1.0,
                         rngs={"cfg": jax.random.PRNGKey(2)})
        out = np.asarray(out)
        assert (out[:, 0] == 2).all() and (out[:, 1:] == 0).all()

    def test_concat_model_shapes(self, rng):
        from ezaudio_tpu.models.cfg_wrappers import ConcatModel
        from flax import linen as nn

        class Passthrough(nn.Module):
            @nn.compact
            def __call__(self, x, timesteps, context=None, x_mask=None,
                         context_mask=None):
                return x

        m = ConcatModel(backbone=Passthrough(), in_dim=4, strides=(2,))
        x = jnp.zeros((2, 8, 3))
        cond = jnp.zeros((2, 16, 4))
        v = m.init({"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
                   x, jnp.zeros((2,)), cond)
        out = m.apply(v, x, jnp.zeros((2,)), cond)
        assert out.shape == (2, 8, 8 + 3)  # downsampled cond channels + x


class TestManifest:
    def test_create_csv(self, tmp_path, rng):
        from ezaudio_tpu.data.manifest import create_csv, find_audio

        for i in range(3):
            save_wav(str(tmp_path / f"clip_{i}.wav"),
                     (0.2 * rng.standard_normal(8000)).astype(np.float32), 8000)
        df = create_csv(str(tmp_path), str(tmp_path / "meta.csv"))
        assert len(df) == 3
        assert set(df.columns) >= {"audio_path", "caption", "split",
                                   "audio_length", "absolute_index"}
        assert abs(df["audio_length"].iloc[0] - 1.0) < 0.01
        assert len(find_audio(str(tmp_path))) == 3


class TestAudioDataset:
    def test_multi_source_aligned(self, tmp_path, rng):
        from ezaudio_tpu.data.audio_dataset import AudioDataset, AudioLoader

        d1, d2 = tmp_path / "a", tmp_path / "b"
        d1.mkdir(), d2.mkdir()
        for i in range(3):
            save_wav(str(d1 / f"{i}.wav"),
                     (0.3 * rng.standard_normal(16000)).astype(np.float32), 8000)
            save_wav(str(d2 / f"{i}.wav"),
                     (0.3 * rng.standard_normal(16000)).astype(np.float32), 8000)
        ds = AudioDataset([AudioLoader([str(d1)]), AudioLoader([str(d2)])],
                          duration=0.5, sample_rate=8000, n_examples=4,
                          aligned=True, loudness_cutoff=None)
        item = ds[0]
        assert item["signal_0"].signal_length == 4000
        assert item["signal_1"].signal_length == 4000
        batch = next(ds.batches(2))
        assert batch["signal_0"].batch_size == 2

    def test_deterministic_per_index(self, tmp_path, rng):
        from ezaudio_tpu.data.audio_dataset import AudioDataset, AudioLoader

        save_wav(str(tmp_path / "x.wav"),
                 (0.3 * rng.standard_normal(32000)).astype(np.float32), 8000)
        ds = AudioDataset(AudioLoader([str(tmp_path)]), duration=0.5,
                          sample_rate=8000, n_examples=2, loudness_cutoff=None)
        a = ds[0]["signal"].audio_data
        b = ds[0]["signal"].audio_data
        np.testing.assert_array_equal(a, b)


class TestModelIO:
    def test_save_load_roundtrip(self, tmp_path):
        from ezaudio_tpu.codecs.dac import DAC
        from ezaudio_tpu.training.model_io import load_model, save_model

        kwargs = dict(encoder_dim=4, encoder_rates=(2, 4), latent_dim=8,
                      decoder_dim=16, decoder_rates=(4, 2), n_codebooks=2,
                      codebook_size=16, codebook_dim=4, sample_rate=8000)
        model = DAC(**kwargs)
        x = jnp.zeros((1, 64, 1))
        params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        folder = save_model(str(tmp_path / "bundle"), "dac",
                            {**kwargs, "encoder_rates": list(kwargs["encoder_rates"]),
                             "decoder_rates": list(kwargs["decoder_rates"])},
                            params, {"note": "test"})
        m2, p2, meta = load_model(folder)
        assert meta["note"] == "test"
        out1 = model.apply({"params": params}, x)["audio"]
        out2 = m2.apply({"params": p2}, x)["audio"]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


class TestDemoCLIs:
    def test_help_runs(self):
        import subprocess
        import sys

        for script in ("t2a_demo.py", "controlnet_demo.py"):
            r = subprocess.run([sys.executable, script, "--help"],
                               capture_output=True, text=True, timeout=120,
                               cwd=os.path.dirname(os.path.dirname(__file__)))
            assert r.returncode == 0, r.stderr
            assert "--prompt" in r.stdout


class TestTrackerReviewFixes:
    def test_is_best_after_resume_with_empty_history(self):
        from ezaudio_tpu.training.tracker import Tracker

        t1 = Tracker()
        t1.update("val", {"loss": 0.5})
        assert t1.is_best("val/loss")
        state = t1.state_dict()

        t2 = Tracker()
        t2.load_state_dict(state)
        # no metrics recorded yet -> must NOT declare the empty mean a best
        assert not t2.is_best("val/loss")
        assert t2.best["val/loss"] == 0.5
        t2.update("val", {"loss": 0.4})
        assert t2.is_best("val/loss")

    def test_timer_records_on_exception(self):
        from ezaudio_tpu.training.tracker import Tracker, timer

        t = Tracker()
        try:
            with timer(t, "boom"):
                raise RuntimeError("x")
        except RuntimeError:
            pass
        assert t.counts["time/boom"] == 1


class TestAlignedWindows:
    def test_aligned_loaders_share_offset_and_source(self, tmp_path, rng):
        """aligned=True must pin the excerpt WINDOW (not just the file
        index) across loaders — paired codec data breaks otherwise."""
        from ezaudio_tpu.data.audio_dataset import AudioDataset, AudioLoader

        sr = 8000
        d1, d2 = tmp_path / "in", tmp_path / "tgt"
        d1.mkdir(), d2.mkdir()
        # content = ramp so the excerpt offset is recoverable from values
        ramp = (np.arange(4 * sr) / (4 * sr)).astype(np.float32)
        save_wav(str(d1 / "0.wav"), ramp, sr)
        save_wav(str(d2 / "0.wav"), ramp, sr)
        ds = AudioDataset([AudioLoader([str(d1)]), AudioLoader([str(d2)])],
                          duration=0.5, sample_rate=sr, n_examples=8,
                          aligned=True, loudness_cutoff=None)
        for idx in range(4):
            item = ds[idx]
            s0, s1 = item["signal_0"], item["signal_1"]
            assert s0.metadata["offset"] == s1.metadata["offset"]
            np.testing.assert_allclose(s0.audio_data, s1.audio_data,
                                       atol=1e-6)

    def test_aligned_salient_path_shares_window(self, tmp_path, rng):
        from ezaudio_tpu.data.audio_dataset import AudioDataset, AudioLoader

        sr = 8000
        d1, d2 = tmp_path / "in", tmp_path / "tgt"
        d1.mkdir(), d2.mkdir()
        x = (0.3 * rng.standard_normal(4 * sr)).astype(np.float32)
        save_wav(str(d1 / "0.wav"), x, sr)
        save_wav(str(d2 / "0.wav"), x, sr)
        ds = AudioDataset([AudioLoader([str(d1)]), AudioLoader([str(d2)])],
                          duration=0.5, sample_rate=sr, n_examples=2,
                          aligned=True, loudness_cutoff=-40.0)
        item = ds[0]
        np.testing.assert_allclose(item["signal_0"].audio_data,
                                   item["signal_1"].audio_data, atol=1e-6)
