"""torch -> jax -> torch round trip must be the identity."""

import os

import numpy as np
import pytest

from tests.test_parity import load


class TestExportRoundTrip:
    @pytest.mark.parametrize("fixture,cfg_name", [
        ("maskdit_tiny.npz", "TINY_MODEL"),
        ("maskdit_tiny2.npz", "VARIANT"),
    ])
    def test_roundtrip_identity(self, fixture, cfg_name):
        from ezaudio_tpu.convert.jax_to_torch import export_maskdit_state_dict
        from ezaudio_tpu.convert.torch_to_jax import convert_maskdit_state_dict

        if cfg_name == "TINY_MODEL":
            from tests.test_dit import TINY_MODEL as cfg
        else:
            from tests.test_parity import TestMaskDiTVariantParity

            cfg = TestMaskDiTVariantParity.VARIANT

        d = load(fixture)
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        params = convert_maskdit_state_dict(sd, cfg)
        back = export_maskdit_state_dict(params, cfg)

        missing = set(sd) - set(back)
        extra = set(back) - set(sd)
        # buffers like sinusoidal PE tables are not parameters; ignore them
        missing = {k for k in missing if ".pe" not in k}
        assert not missing, f"missing: {sorted(missing)[:8]}"
        assert not extra, f"extra: {sorted(extra)[:8]}"
        for k in back:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    def test_save_reference_checkpoint(self, tmp_path):
        import torch

        from ezaudio_tpu.convert.jax_to_torch import save_reference_checkpoint
        from ezaudio_tpu.convert.torch_to_jax import convert_maskdit_state_dict
        from tests.test_dit import TINY_MODEL

        d = load("maskdit_tiny.npz")
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        params = convert_maskdit_state_dict(sd, TINY_MODEL)
        p = str(tmp_path / "export.pt")
        save_reference_checkpoint(p, params, TINY_MODEL)
        loaded = torch.load(p, map_location="cpu", weights_only=True)["model"]
        np.testing.assert_array_equal(loaded["mask_embed"].numpy(),
                                      sd["mask_embed"])


class TestControlNetExport:
    def test_roundtrip_identity(self):
        from ezaudio_tpu.convert.jax_to_torch import export_controlnet_state_dict
        from ezaudio_tpu.convert.torch_to_jax import convert_controlnet_state_dict
        from tests.test_controlnet import TINY_CN
        from tests.test_dit import TINY_MODEL

        d = load("controlnet_tiny.npz")
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        params = convert_controlnet_state_dict(sd, TINY_MODEL, TINY_CN)
        back = export_controlnet_state_dict(params, TINY_MODEL, TINY_CN)
        missing = {k for k in set(sd) - set(back) if ".pe" not in k}
        assert not missing, sorted(missing)[:8]
        assert not set(back) - set(sd), sorted(set(back) - set(sd))[:8]
        for k in back:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


class TestVerifyCheckpoints:
    """Drive scripts/verify_checkpoints.py end-to-end on synthetic .pt files
    in the EXACT published formats (DiT ``{'model': sd}``, VAE
    ``{'state_dict': {'autoencoder.*'}}`` with unfolded weight_g/weight_v,
    ControlNet ``{'model': sd}``) so the real-weights on-ramp is exercised
    in CI before real checkpoints ever arrive.

    Load contracts: /root/reference/api/ezaudio.py:84 and
    /root/reference/src/modules/stable_vae/__init__.py:25-28.
    """

    @pytest.fixture(scope="class")
    def vc(self):
        import importlib.util

        path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "verify_checkpoints.py")
        spec = importlib.util.spec_from_file_location("verify_checkpoints",
                                                      os.path.abspath(path))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_dit_pt(self, vc, tmp_path):
        import torch

        from tests.test_dit import TINY_MODEL

        d = load("maskdit_tiny.npz")
        sd = {k[len("sd."):]: torch.tensor(v) for k, v in d.items()
              if k.startswith("sd.")}
        p = str(tmp_path / "dit.pt")
        torch.save({"model": sd}, p)

        r = vc.verify_dit(p, TINY_MODEL, context_len=7)
        assert r["count_ok"], (r["converted_params"], r["reference_tensors"])
        assert r["finite"]
        assert r["t_conditioning_delta"] >= 0

    def test_vae_pt(self, vc, tmp_path):
        import torch

        d = load("vae_tiny.npz")
        sd = {}
        for k, v in d.items():
            if k.startswith("enc."):
                sd["autoencoder.encoder.layers." + k[len("enc.layers."):]] = \
                    torch.tensor(v)
            elif k.startswith("dec."):
                sd["autoencoder.decoder.layers." + k[len("dec.layers."):]] = \
                    torch.tensor(v)
        p = str(tmp_path / "vae.pt")
        torch.save({"state_dict": sd}, p)

        # config matching the fixture geometry (gen_goldens tiny VAE)
        vae_cfg = dict(
            model_type="autoencoder", sample_rate=800, audio_channels=1,
            model=dict(
                encoder=dict(type="oobleck", config=dict(
                    in_channels=1, channels=8, c_mults=[1, 2], strides=[2, 4],
                    latent_dim=8, use_snake=True)),
                decoder=dict(type="oobleck", config=dict(
                    out_channels=1, channels=8, c_mults=[1, 2], strides=[2, 4],
                    latent_dim=4, use_snake=True, final_tanh=False)),
                bottleneck=dict(type="vae"),
                latent_dim=4, downsampling_ratio=8, io_channels=1,
            ),
        )
        r = vc.verify_vae(p, vae_cfg, num_blocks=2, sine_seconds=0.5)
        assert r["finite"]
        assert r["converted_params"] > 0
        # random weights won't reconstruct; the report must still carry a
        # finite SI-SDR number (the script's SUSPICIOUS/OK logic)
        assert np.isfinite(r["roundtrip_si_sdr_db"])

    def test_controlnet_pt(self, vc, tmp_path):
        import torch

        from tests.test_controlnet import TINY_CN
        from tests.test_dit import TINY_MODEL

        d = load("controlnet_tiny.npz")
        sd = {k[len("sd."):]: torch.tensor(v) for k, v in d.items()
              if k.startswith("sd.")}
        p = str(tmp_path / "cn.pt")
        torch.save({"model": sd}, p)

        r = vc.verify_controlnet(p, TINY_MODEL, TINY_CN)
        assert r["count_ok"], (r["converted_params"], r["reference_tensors"])
