"""EzAudio_ControlNet: energy-conditioned generation facade.

API parity with reference ``api/controlnet.py`` (class EzAudio_ControlNet):
``generate_audio(text, audio_path, surpass_noise=0, guidance_scale=3.5,
guidance_rescale=0, ddim_steps=50, eta=1, conditioning_scale=1, ...)``.

The per-step three-phase call of the reference
(inference_controlnet.py:89-99) — MaskDiT concat, ControlNet skips, backbone
with skips — lives INSIDE one jitted scan here; the three phases are a
single fused XLA program per step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.api.ezaudio import EzAudio, MAX_SEED
from ezaudio_tpu.diffusion.sampling import sample_latents
from ezaudio_tpu.models.conditioners import Conditioner
from ezaudio_tpu.models.controlnet import controlnet_from_config, init_params_from_base
from ezaudio_tpu.models.maskdit import MaskDiT
from ezaudio_tpu.data.audio_io import load_wav, peak_normalize
from ezaudio_tpu.utils import scale_shift_re


class EzAudioControlNet:
    def __init__(
        self,
        model_name: str = "energy",
        config: Optional[dict] = None,
        config_path: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        controlnet_path: Optional[str] = None,
        vae_path: Optional[str] = None,
        t5_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        t5_config=None,
        vae_config: Optional[dict] = None,
        dtype=jnp.float32,
        seed: int = 0,
        mesh=None,
        base: Optional[EzAudio] = None,
    ):
        # base model (DiT + VAE + T5 + scheduler).  Pass ``base=`` to share
        # an existing EzAudio instance (serving both the t2a and ControlNet
        # paths from ONE param set + compile cache — GenerationServer does
        # this); otherwise one is built here, on ``mesh`` if given.
        if base is not None:
            self.base = base
            mesh = base.mesh
        else:
            self.base = EzAudio(
                model_name=model_name,
                config=config, config_path=config_path, ckpt_path=ckpt_path,
                vae_path=vae_path, t5_path=t5_path,
                tokenizer_path=tokenizer_path,
                t5_config=t5_config, vae_config=vae_config, dtype=dtype,
                seed=seed, mesh=mesh)
        cfg = self.base.params_cfg
        self.dtype = dtype

        self.controlnet = controlnet_from_config(
            cfg.model.to_dict(), cfg.controlnet.to_dict(), dtype=dtype)
        if controlnet_path:
            from ezaudio_tpu.convert.torch_to_jax import (
                convert_controlnet_state_dict, load_torch_checkpoint)

            sd = load_torch_checkpoint(controlnet_path, key="model")
            self.cn_params = {"params": convert_controlnet_state_dict(
                sd, cfg.model, cfg.controlnet)}
        else:
            key = jax.random.PRNGKey(seed + 1)
            L = cfg.model.img_size
            cond_frames = L * 2 ** (len(cfg.controlnet.cond_blocks) - 1)
            variables = self.controlnet.init(
                {"params": key, "mask": key},
                jnp.zeros((1, L, cfg.model.in_chans), dtype),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, cfg.model.context_dim), dtype),
                condition=jnp.zeros((1, cond_frames, cfg.controlnet.cond_in), dtype))
            params = init_params_from_base(
                variables["params"], self.base.dit_params["params"]["model"])
            self.cn_params = {"params": params}

        if mesh is not None:
            # ControlNet weights replicate on the mesh (they mirror the DiT
            # in-blocks but the single-clip path's win is sharing the
            # already-placed base params, not tp on the branch)
            from ezaudio_tpu.parallel.mesh import replicate

            self.cn_params = replicate(mesh, self.cn_params)

        self.conditioner = Conditioner(**cfg.conditioner.to_dict())

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=16)
    def _sampler(self, steps: int, guidance_scale, guidance_rescale, eta,
                 conditioning_scale: float, sampler: str = "ddim",
                 quant=None):
        base = self.base
        dit: MaskDiT = base.dit
        cn = self.controlnet
        schedule = base.noise_scheduler

        @jax.jit
        def _run(dit_params, cn_params, noise, ctx, cmask, condition, key):
            def model_fn(lat, t):
                n = lat.shape[0] // condition.shape[0]
                cond_b = jnp.concatenate([condition] * n, axis=0)
                concat, _ = dit.apply(dit_params, lat, t, ctx,
                                      context_mask=cmask, forward_model=False)
                skips = cn.apply(cn_params, concat, t, ctx, context_mask=cmask,
                                 condition=cond_b,
                                 conditioning_scale=conditioning_scale)
                return dit.apply(dit_params, concat, t, ctx, x_mask=None,
                                 context_mask=cmask, cls_token=None,
                                 controlnet_skips=skips,
                                 method=MaskDiT.forward_backbone)

            if sampler == "dpm":
                from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

                return dpm_solver_sample(model_fn, schedule, noise, steps,
                                         guidance_scale=guidance_scale,
                                         guidance_rescale=guidance_rescale)
            return sample_latents(model_fn, schedule, noise, key, steps,
                                  guidance_scale=guidance_scale,
                                  guidance_rescale=guidance_rescale, eta=eta)

        def run(*args):
            # trace-time int8 opt-in, same mechanism as EzAudio._sampler
            from ezaudio_tpu.ops.quant import quant_context

            with quant_context(quant):
                return _run(*args)

        return run

    # ------------------------------------------------------------------
    def generate_audio(
        self,
        text: str,
        audio_path: Union[str, np.ndarray],
        surpass_noise: float = 0.0,
        guidance_scale: Optional[float] = 3.5,
        guidance_rescale: float = 0.0,
        ddim_steps: int = 50,
        eta: float = 1.0,
        conditioning_scale: float = 1.0,
        random_seed: Optional[int] = None,
        randomize_seed: bool = False,
        sampler: str = "ddim",
        quant: Optional[str] = None,
    ) -> Tuple[int, np.ndarray]:
        base = self.base
        sr = base.sr
        if isinstance(audio_path, str):
            gt, _ = load_wav(audio_path, sr=sr)
        else:
            gt = np.asarray(audio_path, np.float32)
        gt = peak_normalize(gt)
        if surpass_noise > 0:
            gt = np.where(np.abs(gt) <= surpass_noise, 0.0, gt)

        original_length = len(gt)
        num_samples = int(10 * sr)
        audio_frames = round(num_samples / sr * base.latent_sr)
        if len(gt) < num_samples:
            gt = np.pad(gt, (0, num_samples - len(gt)))
        else:
            gt = gt[:num_samples]

        condition = self.conditioner(gt[None, :])

        if randomize_seed or random_seed is None:
            random_seed = np.random.randint(0, MAX_SEED)
        key = jax.random.PRNGKey(random_seed)
        k_noise, k_steps = jax.random.split(key)

        texts = [text]
        if text == "":
            guidance_scale = None
        cond_emb, cond_mask = base.embed_text(texts)
        if guidance_scale:
            # cached empty-prompt embedding (base keeps an lru_cache; a
            # fresh T5 forward per call wastes one tunnel dispatch)
            un_emb, un_mask = base._uncond_embedding(1)
            ctx = jnp.concatenate([cond_emb, un_emb], axis=0)
            cmask = jnp.concatenate([cond_mask, un_mask], axis=0)
        else:
            guidance_scale = None  # 0.0 means no CFG (single-batch path)
            ctx, cmask = cond_emb, cond_mask

        noise = jax.random.normal(k_noise, (1, audio_frames, base.latent_dim),
                                  self.dtype)
        run = self._sampler(int(ddim_steps), guidance_scale,
                            float(guidance_rescale), float(eta),
                            float(conditioning_scale), sampler, quant)
        latents = run(base.dit_params, self.cn_params, noise, ctx, cmask,
                      jnp.asarray(condition, self.dtype), k_steps)
        pred = scale_shift_re(latents, base.scale, base.shift)
        wav = np.asarray(base.autoencoder.decode(pred))[0, :, 0]
        return sr, wav[:original_length]


# Reference-spelled alias (api/controlnet.py class EzAudio_ControlNet)
EzAudio_ControlNet = EzAudioControlNet
