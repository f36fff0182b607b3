"""torch -> jax -> torch round trip must be the identity."""

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
