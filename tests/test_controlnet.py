"""ControlNet parity + conditioner parity + end-to-end conditioned generation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

TINY_CN = dict(cond_in=1, cond_blocks=[16, 32], cond_mask=True,
               cond_mask_prob=0.25, cond_mask_ratio=[0.25, 0.5], cond_mask_span=4)


def load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run scripts/gen_goldens.py")
    return dict(np.load(path, allow_pickle=False))


class TestControlNetParity:
    def test_skips_match_reference(self):
        from ezaudio_tpu.convert.torch_to_jax import convert_controlnet_state_dict
        from ezaudio_tpu.models.controlnet import controlnet_from_config
        from tests.test_dit import TINY_MODEL

        d = load("controlnet_tiny.npz")
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        cn = controlnet_from_config(TINY_MODEL, TINY_CN)
        params = {"params": convert_controlnet_state_dict(sd, TINY_MODEL, TINY_CN)}

        skips = cn.apply(
            params,
            jnp.asarray(d["x"].transpose(0, 2, 1)),
            jnp.asarray(d["t"]),
            jnp.asarray(d["ctx"]),
            context_mask=jnp.asarray(d["cmask"]),
            condition=jnp.asarray(d["cond"].transpose(0, 2, 1)),
            conditioning_scale=0.7,
        )
        assert len(skips) == int(d["n_skips"])
        for i, s in enumerate(skips):
            np.testing.assert_allclose(
                np.asarray(s), d[f"skip{i}"], atol=2e-3)


class TestEnergyParity:
    def test_energy_matches_reference(self):
        from ezaudio_tpu.models.conditioners import energy_condition

        d = load("energy_tiny.npz")
        got = np.asarray(energy_condition(
            jnp.asarray(d["audio"]), hop_size=240, window_size=1920,
            padding="reflect", min_db=-60, norm=True))
        np.testing.assert_allclose(got, d["energy"], atol=1e-4)


class TestBandSplit:
    def test_bands_sum_to_input(self, rng):
        from ezaudio_tpu.models.conditioners import split_bands

        x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        bands = split_bands(x, n_bands=4, sample_rate=16000)
        np.testing.assert_allclose(np.asarray(bands.sum(0)), np.asarray(x),
                                   atol=1e-4)

    def test_band_frequency_ordering(self):
        from ezaudio_tpu.models.conditioners import split_bands

        sr, T = 16000, 8000
        t = np.arange(T) / sr
        low = np.sin(2 * np.pi * 500 * t).astype(np.float32)
        high = np.sin(2 * np.pi * 7000 * t).astype(np.float32)
        bands_low = np.asarray(split_bands(jnp.asarray(low[None]), 4, sr))
        bands_high = np.asarray(split_bands(jnp.asarray(high[None]), 4, sr))
        # 500 Hz lives in band 0 (<2kHz); 7 kHz in band 3 (>6kHz)
        assert np.square(bands_low[0]).sum() > 0.8 * np.square(low).sum()
        assert np.square(bands_high[3]).sum() > 0.8 * np.square(high).sum()


class TestChroma:
    def test_chroma_shapes_and_onehot(self, rng):
        from ezaudio_tpu.models.conditioners import chroma_condition

        audio = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
        c = np.asarray(chroma_condition(audio, sample_rate=16000, n_chroma=12,
                                        winlen=2048, nfft=2048, winhop=512))
        assert c.shape[0] == 2 and c.shape[2] == 12
        np.testing.assert_allclose(c.sum(-1), 1.0, atol=1e-6)  # one-hot

    def test_chroma_detects_pitch_class(self):
        from ezaudio_tpu.models.conditioners import chroma_condition

        sr = 16000
        t = np.arange(sr) / sr
        a440 = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        c = np.asarray(chroma_condition(jnp.asarray(a440[None]), sample_rate=sr,
                                        n_chroma=12, winlen=4096, nfft=4096,
                                        winhop=1024))
        # A = pitch class 9 with base_c rolling
        assert (c[0, :, 9] == 1).mean() > 0.9


class TestControlNetEndToEnd:
    def test_generate_with_energy_condition(self):
        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from tests.tiny_config import TINY_CONFIG, TINY_T5, TINY_SR, TINY_VAE_CONFIG

        cfg = dict(TINY_CONFIG)
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[8, 16], cond_mask=True,
                                 cond_mask_prob=0.25, cond_mask_ratio=[0.25, 0.5],
                                 cond_mask_span=4)
        # hop chosen so 10 s at TINY_SR -> 2x latent frames (pyramid halves)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=8,
                                  window_size=64, padding="reflect",
                                  min_db=-60, norm=True)
        ez = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                               vae_config=TINY_VAE_CONFIG)
        ref = (0.5 * np.sin(2 * np.pi * 55 * np.arange(2 * TINY_SR) / TINY_SR)).astype(np.float32)
        sr, wav = ez.generate_audio("a rising tone", ref, ddim_steps=3,
                                    random_seed=0)
        assert sr == TINY_SR
        assert wav.shape == ref.shape
        assert np.isfinite(wav).all()

    def test_generate_from_reference_mp3_asset(self):
        """The reference's OWN ControlNet demo input (egs/reference.mp3,
        /root/reference/controlnet_demo.py:12) must drive generation
        end-to-end — mp3 decode (native codec bridge) -> resample ->
        energy conditioning -> sampling, same path as controlnet_demo.py
        --ref reference.mp3."""
        import os

        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from ezaudio_tpu.data import codec_loader
        from tests.tiny_config import TINY_CONFIG, TINY_T5, TINY_SR, TINY_VAE_CONFIG

        path = "/root/reference/egs/reference.mp3"
        if not (os.path.exists(path) and codec_loader.available()):
            pytest.skip("reference asset or codec bridge unavailable")
        cfg = dict(TINY_CONFIG)
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[8, 16], cond_mask=True,
                                 cond_mask_prob=0.25, cond_mask_ratio=[0.25, 0.5],
                                 cond_mask_span=4)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=8,
                                  window_size=64, padding="reflect",
                                  min_db=-60, norm=True)
        ez = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                               vae_config=TINY_VAE_CONFIG)
        sr, wav = ez.generate_audio("a dog barking", path, ddim_steps=3,
                                    random_seed=0)
        assert sr == TINY_SR
        assert np.isfinite(wav).all()
        assert float(np.abs(wav).max()) > 0

    def test_generate_with_int8_quant(self, monkeypatch):
        """ControlNet path under quant='int8' (threshold lowered so the
        tiny linears quantize): finite and close to the float output."""
        import ezaudio_tpu.ops.quant as quant_mod
        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from tests.tiny_config import TINY_CONFIG, TINY_T5, TINY_SR, TINY_VAE_CONFIG

        cfg = dict(TINY_CONFIG)
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[8, 16], cond_mask=True,
                                 cond_mask_prob=0.25, cond_mask_ratio=[0.25, 0.5],
                                 cond_mask_span=4)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=8,
                                  window_size=64, padding="reflect",
                                  min_db=-60, norm=True)
        ez = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                               vae_config=TINY_VAE_CONFIG)
        ref = (0.5 * np.sin(2 * np.pi * 55 * np.arange(2 * TINY_SR) / TINY_SR)).astype(np.float32)
        _, w_f = ez.generate_audio("a tone", ref, ddim_steps=3, random_seed=1)
        monkeypatch.setattr(quant_mod, "MIN_QUANT_ELEMENTS", 64 * 64)
        _, w_q = ez.generate_audio("a tone", ref, ddim_steps=4, random_seed=1,
                                   quant="int8")
        assert np.isfinite(w_q).all()


class TestControlNetSharedBase:
    """EzAudioControlNet(base=...) shares one EzAudio (params + compile
    caches) and mesh= forwards to the base — the serving configuration."""

    @staticmethod
    def _cfg():
        from tests.tiny_config import TINY_CONFIG

        cfg = dict(TINY_CONFIG)
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[8, 16], cond_mask=True,
                                 cond_mask_prob=0.25, cond_mask_ratio=[0.25, 0.5],
                                 cond_mask_span=4)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=8,
                                  window_size=64, padding="reflect",
                                  min_db=-60, norm=True)
        return cfg

    def test_shared_base_matches_own_base(self):
        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from ezaudio_tpu.api.ezaudio import EzAudio
        from tests.tiny_config import TINY_T5, TINY_SR, TINY_VAE_CONFIG

        cfg = self._cfg()
        own = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                                vae_config=TINY_VAE_CONFIG)
        base = EzAudio(config=cfg, t5_config=TINY_T5,
                       vae_config=TINY_VAE_CONFIG)
        shared = EzAudioControlNet(base=base)
        assert shared.base is base
        ref = (0.5 * np.sin(2 * np.pi * 55 * np.arange(2 * TINY_SR) / TINY_SR)
               ).astype(np.float32)
        kw = dict(ddim_steps=3, random_seed=0)
        _, w_own = own.generate_audio("a tone", ref, **kw)
        _, w_shared = shared.generate_audio("a tone", ref, **kw)
        # same config + same seeds -> identical params either way
        np.testing.assert_array_equal(w_own, w_shared)

    def test_mesh_forwarding_matches_single_device(self):
        import jax
        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from ezaudio_tpu.api.ezaudio import EzAudio
        from ezaudio_tpu.parallel.mesh import make_mesh
        from tests.tiny_config import TINY_T5, TINY_SR, TINY_VAE_CONFIG

        cfg = self._cfg()
        ref = (0.5 * np.sin(2 * np.pi * 55 * np.arange(2 * TINY_SR) / TINY_SR)
               ).astype(np.float32)
        kw = dict(ddim_steps=3, random_seed=0)
        solo = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                                 vae_config=TINY_VAE_CONFIG)
        _, w_solo = solo.generate_audio("a tone", ref, **kw)

        mesh = make_mesh(dp=2, devices=jax.devices("cpu")[:2])
        base = EzAudio(config=cfg, t5_config=TINY_T5,
                       vae_config=TINY_VAE_CONFIG, mesh=mesh)
        cn = EzAudioControlNet(base=base)
        _, w_mesh = cn.generate_audio("a tone", ref, **kw)
        np.testing.assert_allclose(w_mesh, w_solo, atol=1e-5)
