"""Golden parity tests: our JAX modules + converter vs. reference outputs.

Fixtures are produced by ``scripts/gen_goldens.py`` running the PyTorch
reference on tiny random configs, and are committed — these tests are
hermetic (no torch, no reference checkout needed at test time).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run scripts/gen_goldens.py")
    return dict(np.load(path, allow_pickle=False))


class TestVAEParity:
    def test_oobleck_encoder_decoder(self):
        from ezaudio_tpu.codecs.oobleck import OobleckDecoder, OobleckEncoder
        from ezaudio_tpu.convert.torch_to_jax import convert_vae_state_dict

        d = load("vae_tiny.npz")
        sd = {}
        for k, v in d.items():
            if k.startswith("enc."):
                sd["encoder.layers." + k[len("enc.layers.") :]] = v
            elif k.startswith("dec."):
                sd["decoder.layers." + k[len("dec.layers.") :]] = v
        params = convert_vae_state_dict(sd, num_blocks=2)

        enc = OobleckEncoder(in_channels=1, channels=8, latent_dim=8,
                             c_mults=(1, 2), strides=(2, 4))
        dec = OobleckDecoder(out_channels=1, channels=8, latent_dim=4,
                             c_mults=(1, 2), strides=(2, 4), final_tanh=False)

        x = jnp.asarray(d["x"].transpose(0, 2, 1))  # (B, T, 1)
        ms = enc.apply({"params": params["encoder"]}, x)
        np.testing.assert_allclose(
            np.asarray(ms), d["mean_scale"].transpose(0, 2, 1), atol=2e-4)

        z = ms[..., :4]
        wav = dec.apply({"params": params["decoder"]}, z)
        np.testing.assert_allclose(
            np.asarray(wav), d["wav"].transpose(0, 2, 1), atol=2e-4)


class TestMaskDiTParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from ezaudio_tpu.convert.torch_to_jax import convert_maskdit_state_dict
        from ezaudio_tpu.models.maskdit import maskdit_from_config
        from tests.test_dit import TINY_MODEL

        d = load("maskdit_tiny.npz")
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        params = {"params": convert_maskdit_state_dict(sd, TINY_MODEL)}
        model = maskdit_from_config(TINY_MODEL)
        return model, params, d

    def test_generation_forward(self, setup):
        model, params, d = setup
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        ctx = jnp.asarray(d["ctx"])
        out, _ = model.apply(params, x, jnp.asarray(d["t"]), ctx,
                             context_mask=jnp.asarray(d["cmask"]))
        np.testing.assert_allclose(
            np.asarray(out), d["out_gen"].transpose(0, 2, 1), atol=2e-3)

    def test_editing_forward(self, setup):
        model, params, d = setup
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        ctx = jnp.asarray(d["ctx"])
        gt = jnp.asarray(d["gt"].transpose(0, 2, 1))
        gmask = jnp.asarray(d["gmask"].transpose(0, 2, 1))  # (B, L, 1)
        out, _ = model.apply(params, x, jnp.asarray(d["t"]), ctx,
                             context_mask=jnp.asarray(d["cmask"]),
                             gt=gt, mae_mask_infer=gmask)
        np.testing.assert_allclose(
            np.asarray(out), d["out_edit"].transpose(0, 2, 1), atol=2e-3)

    def test_concat_only(self, setup):
        model, params, d = setup
        x = jnp.asarray(d["x"].transpose(0, 2, 1))
        ctx = jnp.asarray(d["ctx"])
        concat, _ = model.apply(params, x, jnp.asarray(d["t"]), ctx,
                                context_mask=jnp.asarray(d["cmask"]),
                                forward_model=False)
        np.testing.assert_allclose(
            np.asarray(concat), d["concat"].transpose(0, 2, 1), atol=1e-5)


class TestMaskDiTVariantParity:
    """Second golden at a different switch combination: rmsnorm everywhere,
    ada_single, concat context with sinu PE, abs x-PE, x_only RoPE,
    qkv biases, no output conv — hardens the converter against the full
    mode matrix."""

    VARIANT = dict(
        mae=True, mae_prob=0.25, mask_ratio=[0.25, 1.0], mask_span=4,
        img_size=32, patch_size=1, in_chans=17, out_chans=8, input_type="1d",
        embed_dim=64, depth=4, num_heads=4, mlp_ratio=2.0,
        qkv_bias=True, qk_scale=None, qk_norm="rmsnorm",
        norm_layer="rmsnorm", act_layer="gelu", context_norm=False,
        use_checkpoint=False, time_fusion="ada_single",
        ada_sola_rank=None, ada_sola_alpha=None, cls_dim=None,
        context_dim=24, context_fusion="concat", context_max_length=5,
        context_pe_method="sinu", pe_method="abs", rope_mode="x_only",
        use_conv=False, skip=True, skip_norm=False,
    )

    def test_variant_forward(self):
        from ezaudio_tpu.convert.torch_to_jax import convert_maskdit_state_dict
        from ezaudio_tpu.models.maskdit import maskdit_from_config

        d = load("maskdit_tiny2.npz")
        sd = {k[len("sd."):]: v for k, v in d.items() if k.startswith("sd.")}
        params = {"params": convert_maskdit_state_dict(sd, self.VARIANT)}
        model = maskdit_from_config(self.VARIANT)
        out, _ = model.apply(
            params, jnp.asarray(d["x"].transpose(0, 2, 1)),
            jnp.asarray(d["t"]), jnp.asarray(d["ctx"]),
            context_mask=jnp.asarray(d["cmask"]))
        np.testing.assert_allclose(
            np.asarray(out), d["out"].transpose(0, 2, 1), atol=2e-3)


class TestChunkedVAE:
    """Chunked overlap-discard encode/decode must match the unchunked path
    away from chunk boundaries (autoencoders.py:428-559 semantics)."""

    def _facade(self):
        from ezaudio_tpu.codecs.facade import AutoencoderFacade
        from ezaudio_tpu.codecs.oobleck import AudioVAE

        import jax

        vae = AudioVAE(io_channels=1, channels=8, latent_dim=4,
                       c_mults=(1, 2), strides=(2, 4))
        key = jax.random.PRNGKey(0)
        params = vae.init({"params": key, "sample": key},
                          jnp.zeros((1, 64, 1)))["params"]
        return AutoencoderFacade(vae, params)

    def test_chunked_decode_matches_outside_receptive_field(self, rng):
        """Within-chunk regions farther than the decoder receptive field
        from chunk edges match the unchunked decode exactly; overall error
        stays small (overlap-discard is approximate near seams — the
        reference documents tuning overlap >= RF empirically,
        autoencoders.py:436-441)."""
        facade = self._facade()
        z = jnp.asarray(rng.standard_normal((1, 96, 4)).astype(np.float32))
        full = np.asarray(facade.decode(z))
        chunked = np.asarray(facade.decode_audio(z, chunked=True, overlap=16,
                                                 chunk_size=48))
        assert chunked.shape == full.shape
        spl = facade.downsampling_ratio
        # first chunk interior, > RF (~19 latent frames) from its right edge
        np.testing.assert_allclose(chunked[:, : 25 * spl], full[:, : 25 * spl],
                                   atol=1e-4)
        # global error bounded (seam transients only)
        rel = np.sqrt(np.mean((chunked - full) ** 2) / np.mean(full**2))
        assert rel < 0.1, rel

    def test_chunked_encode_matches_outside_receptive_field(self, rng):
        facade = self._facade()
        wav = jnp.asarray(rng.standard_normal((1, 96 * 8, 1)).astype(np.float32))
        full = np.asarray(facade.encode(wav, sample=False))
        chunked = np.asarray(facade.encode_audio(wav, chunked=True, overlap=16,
                                                 chunk_size=48, sample=False))
        assert chunked.shape == full.shape
        np.testing.assert_allclose(chunked[:, :25], full[:, :25], atol=1e-4)
        rel = np.sqrt(np.mean((chunked - full) ** 2) / np.mean(full**2))
        assert rel < 0.1, rel


class TestPipelineParity:
    """End-to-end composed-path parity vs the torch reference's
    inference() (src/inference.py:26-107 + api/ezaudio.py:101-130):
    HashTokenizer ids -> T5 -> 25-step DDIM + CFG(+rescale) ->
    scale_shift_re -> (paste) -> Oobleck VAE decode, with converted
    weights and the reference's exact init noise (eta=0)."""

    @pytest.fixture(scope="class")
    def ez(self):
        from ezaudio_tpu.api.ezaudio import EzAudio
        from ezaudio_tpu.convert.torch_to_jax import (
            convert_maskdit_state_dict, convert_vae_state_dict)
        from ezaudio_tpu.text.t5 import (
            T5EncoderConfig, convert_t5_encoder_state_dict)
        from scripts.gen_goldens import TINY_DIT_CFG

        d = load("pipeline_tiny.npz")
        config = dict(
            model_name="EzAudio-PipelineTiny",
            model=dict(TINY_DIT_CFG),
            autoencoder=dict(name="stable_vae", dim=8, sr=256,
                             latent_sr=32, q_first=True,
                             scale=float(d["scale"]), shift=float(d["shift"])),
            text_encoder=dict(model="tiny-t5",
                              max_length=int(d["max_length"]), cfg=0.1),
            diff=dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
                      beta_start=0.00085, beta_end=0.012,
                      prediction_type="v_prediction",
                      rescale_betas_zero_snr=True,
                      timestep_spacing="trailing", clip_sample=False),
        )
        vae_config = dict(
            model_type="autoencoder", sample_rate=256, audio_channels=1,
            model=dict(
                encoder=dict(type="oobleck", config=dict(
                    in_channels=1, channels=8, c_mults=[1, 2],
                    strides=[2, 4], latent_dim=16, use_snake=True)),
                decoder=dict(type="oobleck", config=dict(
                    out_channels=1, channels=8, c_mults=[1, 2],
                    strides=[2, 4], latent_dim=8, use_snake=True,
                    final_tanh=False)),
                bottleneck=dict(type="vae"),
                latent_dim=8, downsampling_ratio=8, io_channels=1))
        t5_cfg = T5EncoderConfig(
            vocab_size=256, d_model=24, d_kv=8, d_ff=32, num_layers=2,
            num_heads=4)

        ez = EzAudio(config=config, vae_config=vae_config, t5_config=t5_cfg)

        dit_sd = {k[len("dit."):]: v for k, v in d.items()
                  if k.startswith("dit.")}
        ez.dit_params = {"params": convert_maskdit_state_dict(
            dit_sd, config["model"])}
        t5_sd = {k[len("t5."):]: v for k, v in d.items()
                 if k.startswith("t5.")}
        ez.t5_params = convert_t5_encoder_state_dict(t5_sd, t5_cfg)
        vae_sd = {}
        for k, v in d.items():
            if k.startswith("enc."):
                vae_sd["encoder.layers." + k[len("enc.layers."):]] = v
            elif k.startswith("dec."):
                vae_sd["decoder.layers." + k[len("dec.layers."):]] = v
        ez.autoencoder.params = convert_vae_state_dict(vae_sd, num_blocks=2)
        return ez, d

    def test_generate_matches_reference(self, ez):
        ez, d = ez
        noise = jnp.asarray(d["noise"].transpose(0, 2, 1))  # (1, 32, 8)
        sr, wav = ez.generate_audio(
            [str(d["prompt"][0])], length=1.0,
            guidance_scale=float(d["guidance"]),
            guidance_rescale=float(d["rescale"]),
            ddim_steps=int(d["steps"]), eta=0.0, random_seed=0,
            initial_latents=noise)
        want = d["wav"][:, 0, :]  # (1, T)
        assert wav.shape == want.shape
        np.testing.assert_allclose(wav, want, atol=1e-4)
        # and tightly correlated (atol alone can hide gross scale issues)
        c = np.corrcoef(wav.ravel(), want.ravel())[0, 1]
        assert c > 0.9999, c

    def test_editing_paste_matches_reference(self, ez):
        from ezaudio_tpu.utils import scale_shift_re

        ez, d = ez
        noise = jnp.asarray(d["noise"].transpose(0, 2, 1))
        gt = jnp.asarray(d["gt"].transpose(0, 2, 1))           # (1, 32, 8)
        gt_mask = jnp.asarray(d["gt_mask"].transpose(0, 2, 1))  # (1, 32, 1)
        latents = ez._generate_latents(
            [str(d["prompt"][0])], 32, float(d["guidance"]), 0.0,
            int(d["steps"]), 0.0, 0, gt=gt, gt_mask=gt_mask,
            initial_latents=noise)
        pred = scale_shift_re(latents, ez.scale, ez.shift)
        pred = jnp.where(gt_mask, pred, gt)  # inference.py:104-105 paste
        wav = np.asarray(ez.autoencoder.decode(pred))[..., 0]
        want = d["wav_edit"][:, 0, :]
        np.testing.assert_allclose(wav, want, atol=1e-4)
