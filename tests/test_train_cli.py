"""End-to-end training CLI + eval harness smoke tests on the tiny config."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from ezaudio_tpu.data.audio_io import save_wav
from tests.tiny_config import TINY_CONFIG, TINY_SR, TINY_T5, TINY_VAE_CONFIG


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A tiny on-disk dataset + config yaml."""
    import yaml

    root = tmp_path_factory.mktemp("ws")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        x = (0.3 * rng.standard_normal(2 * TINY_SR)).astype(np.float32)
        save_wav(str(audio_dir / f"{i}.wav"), x, TINY_SR)
        rows.append(dict(audio_path=f"{i}.wav", caption=f"sound number {i}",
                         split="train" if i < 6 else "val", audio_length=2.0,
                         absolute_index=i, fine_tune_data=True))
    pd.DataFrame(rows).to_csv(root / "meta.csv", index=False)

    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["opt"] = dict(learning_rate=1e-4, beta1=0.9, beta2=0.999,
                      weight_decay=0.01, adam_epsilon=1e-8, warmup=0,
                      grad_clip=1.0, snr_gamma=None, batch_size=2,
                      accumulation_steps=1)
    cfg["data"] = dict(
        train=dict(data_dir=str(audio_dir) + "/", meta_dir=str(root / "meta.csv"),
                   subset="train", fine_tune=True, seg_length=2, sr=TINY_SR,
                   aug_config=None, mono=True, norm=True),
        train_frames=100, sr=TINY_SR,
        val_meta=str(root / "meta.csv"), val_dir=str(audio_dir) + "/")
    cfg_path = root / "tiny.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path


class TestTrainCLI:
    @pytest.mark.heavy  # 30 s end-to-end CLI train loop
    def test_short_training_run(self, workspace, monkeypatch):
        root, cfg_path = workspace
        # tiny T5/VAE need to be injected: patch EzAudio defaults via env of
        # the CLI is overkill — drive main() with a monkeypatched EzAudio.
        import ezaudio_tpu.training.train_cli as cli
        from ezaudio_tpu.api.ezaudio import EzAudio

        orig_init = EzAudio.__init__

        def patched(self, *a, **kw):
            kw.setdefault("t5_config", TINY_T5)
            kw.setdefault("vae_config", TINY_VAE_CONFIG)
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(EzAudio, "__init__", patched)

        trainer = cli.main([
            "--config-name", str(cfg_path),
            "--max-steps", "4",
            "--log-step", "2",
            "--save-every-step", "1000",
            "--log-dir", str(root / "logs"),
            "--save-dir", str(root / "ckpts"),
        ])
        assert int(trainer.state.step) == 4
        log = (root / "logs" / "EzAudio-Tiny" / "log.txt").read_text()
        assert "loss" in log
        # final checkpoint written + restorable
        ckpt_dir = root / "ckpts" / "EzAudio-Tiny"
        assert ckpt_dir.exists()
        trainer.restore_checkpoint(str(ckpt_dir))
        assert int(trainer.state.step) == 4


    @pytest.mark.parametrize("remat,expect", [
        ("dots", dict(use_checkpoint=True, remat_policy="dots")),
        ("off", dict(use_checkpoint=False)),
    ])
    @pytest.mark.heavy  # 35 s: compiles a train step per remat policy
    def test_remat_flag_wires_model_config(self, workspace, monkeypatch,
                                           remat, expect):
        """--remat selects the probe12 activation-remat policy by rewriting
        the model config before EzAudio builds the DiT."""
        root, cfg_path = workspace
        import ezaudio_tpu.training.train_cli as cli
        from ezaudio_tpu.api.ezaudio import EzAudio

        orig_init = EzAudio.__init__
        seen = {}

        def patched(self, *a, **kw):
            seen.update(kw.get("config") or {})
            kw.setdefault("t5_config", TINY_T5)
            kw.setdefault("vae_config", TINY_VAE_CONFIG)
            return orig_init(self, *a, **kw)

        monkeypatch.setattr(EzAudio, "__init__", patched)
        cli.main([
            "--config-name", str(cfg_path), "--max-steps", "1",
            "--log-step", "10", "--save-every-step", "1000",
            "--log-dir", str(root / "logs_remat"),
            "--save-dir", str(root / f"ckpts_remat_{remat}"),
            "--remat", remat,
        ])
        for k, v in expect.items():
            assert seen["model"][k] == v


class TestEvalHarness:
    def test_eval_udit_renders(self, workspace, tmp_path):
        from ezaudio_tpu.training.evaluate import eval_udit
        from tests.tiny_config import make_tiny_ezaudio

        root, _ = workspace
        ez = make_tiny_ezaudio()
        paths = eval_udit(ez, str(root / "meta.csv"), "val",
                          audio_dir=str(root / "audio") + "/",
                          ddim_steps=2, val_num=1,
                          save_path=str(tmp_path / "eval"))
        assert len(paths) == 1 and os.path.exists(paths[0])

    def test_eval_udit_mae_mode(self, workspace, tmp_path):
        from ezaudio_tpu.training.evaluate import eval_udit
        from tests.tiny_config import make_tiny_ezaudio

        root, _ = workspace
        ez = make_tiny_ezaudio()
        paths = eval_udit(ez, str(root / "meta.csv"), "val",
                          audio_dir=str(root / "audio") + "/",
                          mae=True, ddim_steps=2, val_num=1,
                          save_path=str(tmp_path / "eval_mae"))
        assert len(paths) == 1

    def test_codec_fidelity_report(self):
        from ezaudio_tpu.training.evaluate import codec_fidelity_report
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        wavs = (0.3 * np.random.default_rng(0)
                .standard_normal((2, TINY_SR))).astype(np.float32)
        rep = codec_fidelity_report(ez.autoencoder, wavs, TINY_SR)
        assert np.isfinite(rep["si_sdr_db"]) and np.isfinite(rep["mel_distance"])
