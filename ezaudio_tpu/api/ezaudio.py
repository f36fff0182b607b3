"""EzAudio: the end-user text-to-audio facade.

API parity with reference ``api/ezaudio.py`` (class EzAudio):
  * ``generate_audio(text, length=10, guidance_scale=5, guidance_rescale=0.75,
    ddim_steps=100, eta=1, random_seed=None)`` -> (sr, waveform);
  * ``editing_audio(text, boundary, gt_file, mask_start, mask_length, ...)``
    -> (sr, waveform) — mask-based inpainting/outpainting with boundary
    windowing (api/ezaudio.py:132-207);
  * empty prompt disables guidance (api/ezaudio.py:109-111).

Differences by design (TPU-first):
  * no checkpoint downloads — checkpoints are local paths (zero egress);
  * prompts may be a list: batched generation in one jitted call, the
    CFG pair and prompt batch share the leading axis that the data-parallel
    mesh shards (see ezaudio_tpu.parallel);
  * the whole denoise loop is one compiled program per
    (batch, frames, steps, guidance) signature — repeat calls hit the jit
    cache;
  * multi-chip: pass ``mesh=make_mesh()`` (ezaudio_tpu.parallel) and every
    ``generate_audio`` / ``editing_audio`` call runs sharded — the prompt
    batch (and the CFG pair riding the same axis) splits over ``dp``,
    DiT parameters follow the tp/fsdp rules of
    :func:`ezaudio_tpu.parallel.mesh.dit_param_shardings`, and the VAE
    decode shards its chunk batch.  Batches that do not divide the mesh are
    padded internally (noise is drawn at the request batch first, so a
    (prompt, seed) pair reproduces the single-chip draw exactly).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.codecs.facade import AutoencoderFacade
from ezaudio_tpu.codecs.oobleck import vae_from_config
from ezaudio_tpu.config import ConfigDict, MODEL_REGISTRY, load_yaml_with_includes
from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.diffusion.sampling import (
    sample_latents, sample_latents_layer_cached)
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.text.t5 import T5Encoder, T5EncoderConfig, convert_t5_encoder_state_dict
from ezaudio_tpu.text.tokenizer import get_tokenizer
from ezaudio_tpu.data.audio_io import load_wav, peak_normalize
from ezaudio_tpu.utils import scale_shift_re

MAX_SEED = np.iinfo(np.int32).max

_T5_CONFIGS = {
    "google/flan-t5-large": T5EncoderConfig.flan_t5_large,
    "google/flan-t5-xl": T5EncoderConfig.flan_t5_xl,
}


def _load_t5_state_dict(path: str) -> dict:
    """Load T5 weights from a raw state-dict .pt, a HF checkout directory,
    or a .safetensors file — all host-side numpy."""
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no T5 weights found under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


class EzAudio:
    """Text-to-audio generation + editing on TPU.

    Checkpoints: pass local paths to the published torch ``.pt`` files (they
    are converted on load), or ``None`` for random initialization (smoke
    tests / training from scratch).
    """

    def __init__(
        self,
        model_name: str = "s3_l",
        config: Optional[dict] = None,
        config_path: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        vae_path: Optional[str] = None,
        t5_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        t5_config: Optional[T5EncoderConfig] = None,
        vae_config: Optional[dict] = None,
        dtype=jnp.float32,
        seed: int = 0,
        mesh=None,
    ):
        if config is not None:
            self.params_cfg = ConfigDict.wrap(config)
        else:
            if config_path is None:
                config_path = MODEL_REGISTRY[model_name]["config"]
            self.params_cfg = load_yaml_with_includes(config_path)
        cfg = self.params_cfg
        self.sr = cfg.autoencoder.sr
        self.latent_sr = cfg.autoencoder.latent_sr
        self.latent_dim = cfg.autoencoder.dim
        self.scale = cfg.autoencoder.get("scale", 1.0)
        self.shift = cfg.autoencoder.get("shift", 0.0)
        self.dtype = dtype

        key = jax.random.PRNGKey(seed)
        k_dit, k_vae, k_t5 = jax.random.split(key, 3)

        # --- diffusion backbone ---
        self.dit = maskdit_from_config(cfg.model.to_dict(), dtype=dtype)
        if ckpt_path:
            from ezaudio_tpu.convert.torch_to_jax import (
                convert_maskdit_state_dict, load_torch_checkpoint)

            sd = load_torch_checkpoint(ckpt_path, key="model")
            self.dit_params = {"params": convert_maskdit_state_dict(sd, cfg.model)}
        else:
            L = cfg.model.img_size
            self.dit_params = self.dit.init(
                {"params": k_dit, "mask": k_dit},
                jnp.zeros((1, L, cfg.model.out_chans), dtype),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, cfg.model.context_dim), dtype),
            )

        # --- VAE codec ---
        if vae_config is not None:
            vae_cfg = vae_config
        else:
            vae_cfg_path = os.path.join(
                os.path.dirname(MODEL_REGISTRY["vae"]["config"]), "vae.json")
            with open(vae_cfg_path) as f:
                vae_cfg = json.load(f)
        vae_model = vae_from_config(vae_cfg, dtype=dtype)
        if vae_path:
            from ezaudio_tpu.convert.torch_to_jax import (
                convert_vae_state_dict, load_torch_checkpoint, strip_prefix)

            sd = load_torch_checkpoint(vae_path, key="state_dict")
            sd = strip_prefix(sd, "autoencoder.")
            vae_params = convert_vae_state_dict(sd)
        else:
            r = vae_model.downsampling_ratio
            vae_params = vae_model.init(
                {"params": k_vae, "sample": k_vae},
                jnp.zeros((1, r * 4, 1), dtype))["params"]
        self.autoencoder = AutoencoderFacade(
            vae_model, vae_params,
            quantization_first=cfg.autoencoder.get("q_first", True))

        # --- text encoder ---
        if t5_config is not None:
            self.t5_cfg = t5_config
        elif cfg.text_encoder.model in _T5_CONFIGS:
            self.t5_cfg = _T5_CONFIGS[cfg.text_encoder.model]()
        else:
            self.t5_cfg = T5EncoderConfig(d_model=cfg.model.context_dim)
        assert self.t5_cfg.d_model == cfg.model.context_dim, (
            "text encoder width must match model context_dim")
        self.t5 = T5Encoder(self.t5_cfg, dtype=dtype)
        if t5_path:
            self.t5_params = convert_t5_encoder_state_dict(
                _load_t5_state_dict(t5_path), self.t5_cfg)
        else:
            self.t5_params = self.t5.init(
                k_t5, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool))["params"]
        self.max_length = cfg.text_encoder.max_length
        self.tokenizer = get_tokenizer(tokenizer_path, self.t5_cfg.vocab_size)

        # --- device mesh (multi-chip inference) ---
        # The reference wires its one distribution strategy into the
        # user-facing layer via accelerator.prepare
        # (audiotools/ml/accelerator.py:83-105); ours is declarative: place
        # the params once, shard every call's batch axis, let XLA insert
        # the collectives.
        self.mesh = mesh
        if mesh is not None:
            from ezaudio_tpu.parallel.mesh import (
                dit_param_shardings, replicate)

            self.dit_params = jax.tree.map(
                jax.device_put, self.dit_params,
                dit_param_shardings(mesh, self.dit_params))
            self.autoencoder.params = replicate(mesh, self.autoencoder.params)
            self.t5_params = replicate(mesh, self.t5_params)

        # --- schedule ---
        self.noise_scheduler = DDIMSchedule.from_config(cfg.diff)

        self._encode_text = jax.jit(
            lambda p, ids, mask: self.t5.apply({"params": p}, ids, mask))
        # PER-INSTANCE caches: a class-level functools.lru_cache would key
        # on self and pin every EzAudio instance (multi-GB params + all
        # compiled programs) alive for the life of the process
        self._uncond_embedding = functools.lru_cache(maxsize=8)(
            self._uncond_embedding_impl)
        self._sampler = functools.lru_cache(maxsize=32)(self._sampler_impl)
        self._fused = functools.lru_cache(maxsize=32)(self._fused_impl)

    # ------------------------------------------------------------------
    @property
    def _world(self) -> int:
        """Data-parallel world size (the batch axis splits this many ways)."""
        if self.mesh is None:
            return 1
        return (self.mesh.shape.get("dp", 1) * self.mesh.shape.get("fsdp", 1))

    def _shard_rows(self, x):
        """Commit ``x`` with its leading axis split over the data-parallel
        mesh axes (replicated when the axis doesn't divide)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(a for a in ("dp", "fsdp") if self.mesh.shape.get(a, 1) > 1)
        if axes and hasattr(x, "ndim") and x.ndim >= 1 \
                and x.shape[0] % self._world == 0:
            spec = P(axes)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # ------------------------------------------------------------------
    def _uncond_embedding_impl(self, batch: int):
        """Cached empty-prompt embedding (CFG uncond branch)."""
        return self.embed_text([""] * batch)

    def embed_text(self, texts: Sequence[str]):
        ids, mask = self.tokenizer(list(texts), max_length=self.max_length)
        ids = self._shard_rows(jnp.asarray(ids))
        mask = self._shard_rows(jnp.asarray(mask))
        emb = self._encode_text(self.t5_params, ids, mask)
        return emb, mask

    # ------------------------------------------------------------------
    def _denoise_body(self, steps: int, guidance_scale, guidance_rescale,
                      eta, use_gt: bool, guidance_interval=None,
                      sampler: str = "ddim", layer_cache=None,
                      cfg_refresh: int = 1):
        """Pure denoising program (no jit, no trace-time contexts):
        (dit_params, noise, ctx, cmask, gt, gt_mask, key) -> latents.
        Shared by the standalone sampler jit and the fused
        text->waveform program."""
        schedule = self.noise_scheduler
        dit = self.dit

        def _run(dit_params, noise, ctx, cmask, gt, gt_mask, key):
            # ctx/cmask are the CFG-ordered batch [cond; uncond] (or just
            # cond when guidance is off).  With a guidance interval, non-CFG
            # segments call with the single batch — slicing ctx[:n] keeps
            # the cond half (cond-first ordering).
            def _apply(lat, t, **kw):
                n = lat.shape[0]
                if use_gt:
                    r = n // gt.shape[0]
                    gt_b = jnp.concatenate([gt] * r, axis=0)
                    gm_b = jnp.concatenate([gt_mask] * r, axis=0)
                else:
                    gt_b, gm_b = None, None
                out, _ = dit.apply(
                    dit_params, lat, t, ctx[:n], context_mask=cmask[:n],
                    gt=gt_b, mae_mask_infer=gm_b, **kw)
                return out

            def model_fn(lat, t):
                return _apply(lat, t)

            if layer_cache is not None:
                # training-free DiT layer caching (udit.py deep_cache):
                # full-depth every `interval`-th step, shallow re-compute
                # otherwise; composes with DDIM and DPM-Solver (fewer
                # steps x cheaper steps) AND with guidance_interval (the
                # CFG band rounds outward to cache-group boundaries)
                k, interval = layer_cache
                model_full = lambda lat, t: _apply(  # noqa: E731
                    lat, t, collect_deep_k=int(k))
                model_cached = lambda lat, t, deep: _apply(  # noqa: E731
                    lat, t, deep_cache=(int(k), deep))
                if sampler == "dpm":
                    from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

                    return dpm_solver_sample(
                        model_fn, schedule, noise, steps,
                        guidance_scale=guidance_scale,
                        guidance_rescale=guidance_rescale,
                        layer_cache_fns=(model_full, model_cached),
                        cache_interval=int(interval),
                        guidance_interval=guidance_interval,
                        cfg_refresh_interval=int(cfg_refresh))
                return sample_latents_layer_cached(
                    model_full, model_cached, schedule, noise, key, steps,
                    cache_interval=int(interval),
                    guidance_scale=guidance_scale,
                    guidance_rescale=guidance_rescale, eta=eta,
                    guidance_interval=guidance_interval)

            if sampler == "dpm":
                from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

                return dpm_solver_sample(
                    model_fn, schedule, noise, steps,
                    guidance_scale=guidance_scale,
                    guidance_rescale=guidance_rescale,
                    guidance_interval=guidance_interval,
                    cfg_refresh_interval=int(cfg_refresh))
            if sampler == "distilled":
                # serving path for progressively-distilled students
                # (diffusion/distill.py): DDIM on the student's grid, no
                # CFG pair — guidance was folded into the student during
                # distillation.  The loaded checkpoint must BE a student
                # (the architecture is unchanged, so EzAudio loads it
                # like any DiT checkpoint).
                from ezaudio_tpu.diffusion.distill import (
                    distill_tables, distilled_sample)

                tables = distill_tables(schedule, steps)
                return distilled_sample(model_fn, schedule, noise, tables)
            return sample_latents(
                model_fn, schedule, noise, key, steps,
                guidance_scale=guidance_scale,
                guidance_rescale=guidance_rescale, eta=eta,
                guidance_interval=guidance_interval)

        return _run

    def _sampler_impl(self, steps: int, guidance_scale, guidance_rescale, eta,
                 use_gt: bool, guidance_interval=None, sampler: str = "ddim",
                 quant: Optional[str] = None, layer_cache=None,
                 attn_impl: Optional[str] = None, cfg_refresh: int = 1):
        """Compile (and cache) the full denoising program for a signature."""
        _run = jax.jit(self._denoise_body(
            steps, guidance_scale, guidance_rescale, eta, use_gt,
            guidance_interval, sampler, layer_cache, cfg_refresh))

        def run(*args):
            # quant_context / attention_impl_context are trace-time state:
            # the first call traces the program inside them (Linear layers
            # pick the int8 MXU path, Attention picks its impl); later
            # calls hit the compiled cache.  Both are part of the lru_cache
            # key in self._sampler, so distinct settings get distinct jits.
            from ezaudio_tpu.models.blocks import attention_impl_context
            from ezaudio_tpu.ops.quant import quant_context

            with quant_context(quant), attention_impl_context(attn_impl):
                return _run(*args)

        return run

    # ------------------------------------------------------------------
    def _fused_impl(self, steps: int, guidance_scale, guidance_rescale, eta,
                    guidance_interval, sampler: str,
                    quant: Optional[str], layer_cache,
                    attn_impl: Optional[str],
                    B: int, Bp: int, frames: int, draw_noise: bool,
                    cfg: bool, chunk: int, cfg_refresh: int = 1):
        """Compile (and cache) the SINGLE-DISPATCH text->waveform program.

        One jit covers T5 encode -> CFG concat -> (optional in-graph
        noise draw) -> the full sampler scan -> latent re-scale -> chunked
        VAE decode.  The eager path pays one device dispatch per stage
        (~70 ms each through the axon tunnel — CLAUDE.md), which at the
        fast recipe is a double-digit share of end-to-end latency; fusing
        also hands XLA the whole pipeline to schedule (reference hot path
        api/ezaudio.py:101-130).  Sample-level math is IDENTICAL to the
        eager path: same key split, same draw dtype, same ops in the same
        order (equality-tested in tests/test_api.py)."""
        body = self._denoise_body(steps, guidance_scale, guidance_rescale,
                                  eta, False, guidance_interval, sampler,
                                  layer_cache, cfg_refresh)
        t5 = self.t5
        dtype = self.dtype
        latent_dim = self.latent_dim
        scale, shift = self.scale, self.shift
        # the facade's own pure decode fn: the fused program must pick the
        # SAME decoder implementation (flax vs fused resunit kernel) as the
        # staged path, or fused=True silently diverges on TPU
        _decode = self.autoencoder.decode_fn

        def _core(dit_params, t5_params, vae_params, ids, mask,
                  un_emb, un_mask, noise, seed):
            cond = t5.apply({"params": t5_params}, ids, mask)
            if cfg:
                ctx = jnp.concatenate([cond, un_emb], axis=0)
                cmask = jnp.concatenate([mask, un_mask], axis=0)
            else:
                ctx, cmask = cond, mask
            key = jax.random.PRNGKey(seed)
            k_noise, k_steps = jax.random.split(key)
            if draw_noise:
                # draw at the REQUEST batch B, then pad rows — a (prompt,
                # seed) pair reproduces the single-chip draw regardless of
                # dp padding (same contract as _generate_latents)
                noise = jax.random.normal(k_noise, (B, frames, latent_dim),
                                          dtype)
            if Bp > B:
                noise = jnp.concatenate(
                    [noise, jnp.repeat(noise[-1:], Bp - B, axis=0)], axis=0)
            gt = jnp.zeros((Bp, frames, latent_dim), dtype)
            gt_mask = jnp.zeros((Bp, frames, 1), bool)
            latents = body(dit_params, noise, ctx, cmask, gt, gt_mask,
                           k_steps)
            pred = scale_shift_re(latents, scale, shift)
            if Bp <= chunk:
                return _decode(vae_params, pred)
            # bound decoder activation memory exactly like the eager
            # chunked path: lax.map serializes one chunk at a time
            pad = (-Bp) % chunk
            if pad:
                pred = jnp.concatenate(
                    [pred, jnp.repeat(pred[-1:], pad, axis=0)], axis=0)
            wav = jax.lax.map(lambda z: _decode(vae_params, z),
                              pred.reshape((Bp + pad) // chunk, chunk,
                                           *pred.shape[1:]))
            return wav.reshape(Bp + pad, *wav.shape[2:])[:Bp]

        _jitted = jax.jit(_core)

        def run(*args):
            # trace-time contexts, exactly as in _sampler_impl; only the
            # DiT's ops.convs.Linear / models.blocks.Attention consult
            # them, so the T5/VAE stages keep reference numerics
            from ezaudio_tpu.models.blocks import attention_impl_context
            from ezaudio_tpu.ops.quant import quant_context

            with quant_context(quant), attention_impl_context(attn_impl):
                return _jitted(*args)

        return run

    def _generate_fused(self, texts, frames, guidance_scale,
                        guidance_rescale, ddim_steps, eta, random_seed,
                        guidance_interval, sampler, initial_latents,
                        quant, layer_cache, attn_impl, cfg_refresh=1):
        """Host wrapper for the fused program: tokenize, pad to the dp
        world, look up/compile the program, one dispatch, trim."""
        B = len(texts)
        if random_seed is None:
            random_seed = np.random.randint(0, MAX_SEED)
        world = self._world
        pad_n = (-B) % world
        texts_p = list(texts) + [texts[-1]] * pad_n
        Bp = B + pad_n

        ids, mask = self.tokenizer(texts_p, max_length=self.max_length)
        ids = self._shard_rows(jnp.asarray(ids))
        mask = self._shard_rows(jnp.asarray(mask))
        cfg = bool(guidance_scale)
        if cfg:
            un_emb, un_mask = self._uncond_embedding(Bp)
        else:
            guidance_scale = None
            un_emb = jnp.zeros((1, 1, 1), self.dtype)  # unused static arg
            un_mask = jnp.zeros((1, 1), bool)

        draw_noise = initial_latents is None
        if draw_noise:
            noise = jnp.zeros((1, 1, 1), self.dtype)  # unused static arg
        else:
            noise = jnp.asarray(initial_latents, self.dtype)
            assert noise.shape == (B, frames, self.latent_dim), (
                noise.shape, (B, frames, self.latent_dim))
            noise = self._shard_rows(noise)

        chunk = min(Bp, 4 * world)
        run = self._fused(int(ddim_steps), guidance_scale,
                          guidance_rescale, float(eta),
                          tuple(guidance_interval) if guidance_interval
                          else None,
                          sampler, quant,
                          tuple(layer_cache) if layer_cache else None,
                          attn_impl, B, Bp, frames, draw_noise, cfg, chunk,
                          int(cfg_refresh))
        wav = run(self.dit_params, self.t5_params, self.autoencoder.params,
                  ids, mask, un_emb, un_mask, noise,
                  jnp.uint32(random_seed))
        return np.asarray(wav)[:B, :, 0]

    # ------------------------------------------------------------------
    def _generate_latents(
        self, texts: List[str], frames: int,
        guidance_scale, guidance_rescale, ddim_steps, eta, random_seed,
        gt=None, gt_mask=None, guidance_interval=None, sampler="ddim",
        initial_latents=None, quant=None, layer_cache=None, attn_impl=None,
        cfg_refresh=1,
    ):
        B = len(texts)
        if random_seed is None:
            random_seed = np.random.randint(0, MAX_SEED)
        key = jax.random.PRNGKey(random_seed)
        k_noise, k_steps = jax.random.split(key)

        # pad the batch to a multiple of the data-parallel world; the noise
        # is drawn at the REQUEST batch first (below) so a (prompt, seed)
        # pair reproduces the single-chip draw regardless of padding
        world = self._world
        pad_n = (-B) % world
        texts_p = list(texts) + [texts[-1]] * pad_n
        Bp = B + pad_n

        cond, cond_mask = self.embed_text(texts_p)
        if guidance_scale:
            uncond, uncond_mask = self._uncond_embedding(Bp)
            ctx = jnp.concatenate([cond, uncond], axis=0)
            cmask = jnp.concatenate([cond_mask, uncond_mask], axis=0)
        else:
            guidance_scale = None
            ctx, cmask = cond, cond_mask

        if initial_latents is not None:
            noise = jnp.asarray(initial_latents, self.dtype)
            assert noise.shape == (B, frames, self.latent_dim), (
                noise.shape, (B, frames, self.latent_dim))
        else:
            noise = jax.random.normal(
                k_noise, (B, frames, self.latent_dim), self.dtype)
        use_gt = gt is not None
        if not use_gt:
            gt = jnp.zeros((B, frames, self.latent_dim), self.dtype)
            gt_mask = jnp.zeros((B, frames, 1), bool)

        def pad_rows(x):
            if pad_n == 0:
                return jnp.asarray(x)
            x = jnp.asarray(x)
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad_n, axis=0)], axis=0)

        noise, gt, gt_mask = pad_rows(noise), pad_rows(gt), pad_rows(gt_mask)
        if self.mesh is not None:
            noise = self._shard_rows(noise)
            ctx, cmask = self._shard_rows(ctx), self._shard_rows(cmask)
            gt, gt_mask = self._shard_rows(gt), self._shard_rows(gt_mask)

        run = self._sampler(int(ddim_steps), guidance_scale, guidance_rescale,
                            float(eta), use_gt,
                            tuple(guidance_interval) if guidance_interval else None,
                            sampler, quant,
                            tuple(layer_cache) if layer_cache else None,
                            attn_impl, int(cfg_refresh))
        latents = run(self.dit_params, noise, ctx, cmask, gt, gt_mask, k_steps)
        return latents[:B] if pad_n else latents

    # ------------------------------------------------------------------
    def generate_audio(
        self,
        text: Union[str, Sequence[str]],
        length: float = 10,
        guidance_scale: Optional[float] = 5,
        guidance_rescale: float = 0.75,
        ddim_steps: int = 100,
        eta: float = 1,
        random_seed: Optional[int] = None,
        randomize_seed: bool = False,
        guidance_interval: Optional[Tuple[float, float]] = None,
        sampler: str = "ddim",
        initial_latents=None,
        quant: Optional[str] = None,
        layer_cache: Optional[Tuple[int, int]] = None,
        attn_impl: Optional[str] = None,
        fused: bool = False,
        cfg_refresh: int = 1,
    ) -> Tuple[int, np.ndarray]:
        """Generate audio from text.  Returns (sr, waveform).

        ``cfg_refresh=P`` (``sampler='dpm'`` only): recompute the uncond
        CFG branch only every P-th in-band step — every P-th cache GROUP
        with ``layer_cache`` — and guide the other steps with the carried
        delta ``cond + (s-1)*(cond_ref - uncond_ref)`` (diffusion/dpm.py).
        P=1 (default) is the exact CFG pair.

        ``fused=True``: the whole pipeline — T5 encode, CFG concat, noise
        draw, sampler scan, latent re-scale, chunked VAE decode — runs as
        ONE compiled program with a single device dispatch and a single
        host transfer.  Sample-level math is identical to the staged
        default (equality-tested).  Measured throughput is NEUTRAL
        (±2%, BASELINE.md round-3: jax's async dispatch already pipelines
        the staged stages), so the default stays staged — its T5/decode
        sub-programs are shared across recipes and length buckets, which
        is the better compile-cache economics; opt in when single-dispatch
        semantics matter (host-constrained serving, RPC-per-dispatch
        deployments).

        ``attn_impl``: attention implementation override for this call —
        ``'chunked_bf16'`` is ~9% faster at every batch size (probe11)
        and FAD-neutral at mid scale (BASELINE.md round-3 sections);
        None keeps the einsum-f32 reference-parity default.

        ``quant='int8'``: dynamic W8A8 quantization of the DiT linear
        layers — int8 MXU matmuls at ~2x the bf16 rate (ops/quant.py).

        ``layer_cache=(k, interval)``: training-free DiT layer caching —
        every ``interval``-th step runs the full depth and caches the deep
        U-stack activation; the other steps recompute only the k shallow
        in-blocks + k final out-blocks around it (udit.py ``deep_cache``).

        ``initial_latents``: optional (B, frames, C) starting noise —
        overrides the seeded draw (reproducible/controlled generation).

        ``sampler``: 'ddim' (reference parity, eta-noised) or 'dpm'
        (DPM-Solver++(2M), deterministic — comparable quality in ~2-4x
        fewer steps).

        ``text`` may be a list of prompts for batched generation; the
        waveform is then (B, T).

        ``guidance_interval=(t_lo, t_hi)``: training-free speedup — run the
        CFG pair only for timesteps inside the band (arXiv 2404.07724);
        outside it, the conditional model alone runs at half the compute.
        Composes with both samplers AND with ``layer_cache`` (there the
        band rounds outward to cache-group boundaries).
        """
        batched = not isinstance(text, str)
        texts = list(text) if batched else [text]
        if all(t == "" for t in texts):
            # reference: empty prompt -> no CFG.  For a MIXED batch keep
            # the CFG pair: an empty prompt's cond embedding equals the
            # uncond embedding, so its CFG mix reduces to the unguided
            # sample per-prompt while real prompts stay guided
            guidance_scale = None
        if randomize_seed:
            random_seed = np.random.randint(0, MAX_SEED)
        if sampler == "distilled":
            # guidance is folded into a distilled student; a CFG pair
            # would double compute for no effect (and the layer-cache /
            # interval schedules are defined on the full-grid samplers)
            guidance_scale = None
            assert layer_cache is None and guidance_interval is None, (
                "sampler='distilled' does not compose with layer_cache or "
                "guidance_interval")
        if int(cfg_refresh) != 1 and sampler != "dpm":
            raise ValueError(
                "cfg_refresh > 1 is implemented for sampler='dpm' only "
                f"(got sampler={sampler!r})")

        frames = int(length * self.latent_sr)
        # the fused program decodes with the raw decoder; a
        # quantization_first=False facade samples the posterior before
        # decoding (facade.decode), which the fused graph doesn't carry —
        # fall back to the staged path there (EzAudio production configs
        # are q_first=True)
        if fused and not getattr(self.autoencoder, "quantization_first",
                                 True):
            fused = False
        if fused:
            wav = self._generate_fused(
                texts, frames, guidance_scale, guidance_rescale, ddim_steps,
                eta, random_seed, guidance_interval, sampler,
                initial_latents, quant, layer_cache, attn_impl, cfg_refresh)
            return self.sr, (wav if batched else wav[0])
        latents = self._generate_latents(
            texts, frames, guidance_scale, guidance_rescale, ddim_steps, eta,
            random_seed, guidance_interval=guidance_interval, sampler=sampler,
            initial_latents=initial_latents, quant=quant,
            layer_cache=layer_cache, attn_impl=attn_impl,
            cfg_refresh=cfg_refresh)
        pred = scale_shift_re(latents, self.scale, self.shift)
        # The x480 decoder inflates activations ~1000x vs the latent; decode
        # in sub-batches so large prompt batches never exhaust HBM.  Dispatch
        # every chunk before materializing any: chunk i+1 decodes on-device
        # while chunk i rides the host transfer (the transfer is the larger
        # cost through the tunnel — BASELINE.md round-2 probe).  On a mesh
        # the chunk batch shards over dp (4 rows per chip).
        B = pred.shape[0]
        world = self._world
        pad = (-B) % world
        if pad:
            pred = jnp.concatenate(
                [pred, jnp.repeat(pred[-1:], pad, axis=0)], axis=0)
        chunk = min(B + pad, 4 * world)
        parts = [self.autoencoder.decode(self._shard_rows(pred[i : i + chunk]))
                 for i in range(0, B + pad, chunk)]
        wav = np.concatenate(
            [np.asarray(p)[..., 0] for p in parts], axis=0)[:B]
        return self.sr, (wav if batched else wav[0])

    # ------------------------------------------------------------------
    def generate_audio_reranked(
        self,
        text: Union[str, Sequence[str]],
        scorer,
        n_candidates: int = 4,
        text_ids=None,
        return_all: bool = False,
        **generate_kw,
    ):
        """Best-of-K generation: draw ``n_candidates`` samples per prompt in
        ONE batched call, score each against its prompt with CLAP, return
        the best waveform per prompt.

        This fills the reference's *intended* CLAP seam end-to-end — its
        ``src/modules/clap_wrapper.py`` is an empty placeholder file — with
        the native scorer (:class:`ezaudio_tpu.audio.clap.CLAPScorer`).
        Candidates differ by their noise draw (one (B*K, frames, C) draw;
        a fixed ``random_seed`` keeps the whole set reproducible).

        ``scorer``: a ``CLAPScorer``.  ``text_ids``: optional pre-tokenized
        CLAP input_ids for the B prompts — required when the scorer has no
        tokenizer.  ``return_all=True`` additionally returns every
        candidate, reshaped (B, K, T), and the (B, K) score matrix.
        ``**generate_kw`` is forwarded to :meth:`generate_audio` (recipe
        knobs compose: sampler/layer_cache/guidance_interval/...).
        """
        batched = not isinstance(text, str)
        texts = list(text) if batched else [text]
        B, K = len(texts), int(n_candidates)
        assert K >= 1
        tiled = [t for t in texts for _ in range(K)]
        sr, wav = self.generate_audio(tiled, **generate_kw)  # (B*K, T)

        # embed the B prompts ONCE (not per candidate), then per-pair
        # cosine against the (B, K) audio embedding block
        a = scorer.embed_audio(np.asarray(wav), sr)           # (B*K, D)
        t_emb = scorer.embed_text(
            texts if text_ids is None else text_ids)          # (B, D)
        scores = np.asarray(
            jnp.einsum("bkd,bd->bk", a.reshape(B, K, -1), t_emb))
        best = scores.argmax(axis=1)                          # (B,)
        best_wav = wav.reshape(B, K, -1)[np.arange(B), best]
        if not batched:
            best_wav = best_wav[0]
        if return_all:
            return sr, best_wav, wav.reshape(B, K, -1), scores
        return sr, best_wav

    # ------------------------------------------------------------------
    def generate_long(
        self,
        text: str,
        length: float,
        window: float = 10.0,
        overlap: float = 2.0,
        guidance_scale: Optional[float] = 5,
        guidance_rescale: float = 0.75,
        ddim_steps: int = 100,
        eta: float = 1,
        random_seed: Optional[int] = None,
        quant: Optional[str] = None,
        layer_cache: Optional[Tuple[int, int]] = None,
        attn_impl: Optional[str] = None,
    ) -> Tuple[int, np.ndarray]:
        """Generate audio longer than the training window by chained
        outpainting: generate the first ``window`` seconds, then repeatedly
        extend with ``editing_audio``'s outpainting mode using ``overlap``
        seconds of boundary context (the reference reaches long audio the
        same way, by hand, via its editing API)."""
        assert window > overlap >= 0
        sr = self.sr
        if random_seed is None:
            random_seed = np.random.randint(0, MAX_SEED)
        _, audio = self.generate_audio(
            text, length=min(window, length),
            guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
            ddim_steps=ddim_steps, eta=eta, random_seed=random_seed,
            quant=quant, layer_cache=layer_cache, attn_impl=attn_impl)
        step = 0
        while len(audio) < int(length * sr):
            step += 1
            cur_s = len(audio) / sr
            ext = min(window - overlap, length - cur_s)
            _, audio = self.editing_audio(
                text, boundary=overlap, gt_file=audio,
                mask_start=cur_s, mask_length=ext,
                guidance_scale=guidance_scale,
                guidance_rescale=guidance_rescale, ddim_steps=ddim_steps,
                eta=eta, random_seed=random_seed + step,
                quant=quant, layer_cache=layer_cache, attn_impl=attn_impl)
        return sr, audio[: int(length * sr)]

    # ------------------------------------------------------------------
    def editing_audio(
        self,
        text: str,
        boundary: float,
        gt_file: Union[str, np.ndarray],
        mask_start: float,
        mask_length: float,
        guidance_scale: Optional[float] = 3.5,
        guidance_rescale: float = 0.0,
        ddim_steps: int = 100,
        eta: float = 1,
        random_seed: Optional[int] = None,
        randomize_seed: bool = False,
        quant: Optional[str] = None,
        layer_cache: Optional[Tuple[int, int]] = None,
        attn_impl: Optional[str] = None,
        crossfade: float = 0.0,
    ) -> Tuple[int, np.ndarray]:
        """Mask-based editing: regenerate ``[mask_start, mask_start+mask_length)``
        seconds of ``gt_file``, with ``boundary`` seconds of context on each
        side; extends the clip when the mask runs past the end (outpainting).
        Parity: api/ezaudio.py:132-207.

        ``crossfade`` (seconds, default 0 = the reference's hard paste):
        blend generated and gt latents linearly over this span just INSIDE
        each mask edge before decoding.  Out-of-mask content stays exactly
        gt; measured to cut the class-changing seam's artifact component
        (scripts/quality_edit_controlnet_mid.py seam A/B).
        """
        if text == "":
            guidance_scale = None
        if randomize_seed:
            random_seed = np.random.randint(0, MAX_SEED)
        sr = self.sr

        if isinstance(gt_file, str):
            gt, _ = load_wav(gt_file, sr=sr)
        else:
            gt = np.asarray(gt_file, np.float32)
        gt = peak_normalize(gt)

        mask_end = mask_start + mask_length
        audio_length = len(gt) / sr
        mask_start = min(mask_start, audio_length)
        if mask_end > audio_length:
            # outpainting: zero-pad the tail
            padding = round((mask_end - audio_length) * sr)
            gt = np.pad(gt, (0, padding), "constant")
            audio_length = len(gt) / sr
        output_audio = gt.copy()

        boundary = min((mask_end - mask_start) / 2, boundary)
        start_idx = max(mask_start - boundary, 0)
        end_idx = min(mask_end + boundary, audio_length)
        mask_start -= start_idx
        mask_end -= start_idx

        window = gt[round(start_idx * sr) : round(end_idx * sr)]
        # pad window to a multiple of the VAE hop so shapes stay static-ish
        hop = self.autoencoder.downsampling_ratio
        pad = (-len(window)) % hop
        window_p = np.pad(window, (0, pad))
        gt_latent = self.autoencoder.encode(
            window_p[None, :, None],
            key=jax.random.PRNGKey(random_seed or 0))
        B, L, D = gt_latent.shape

        gt_mask = np.zeros((B, L, 1), bool)
        gt_mask[:, round(mask_start * self.latent_sr) : round(mask_end * self.latent_sr)] = True

        latents = self._generate_latents(
            [text], L, guidance_scale, guidance_rescale, ddim_steps, eta,
            random_seed, gt=gt_latent, gt_mask=jnp.asarray(gt_mask),
            quant=quant, layer_cache=layer_cache, attn_impl=attn_impl)
        pred = scale_shift_re(latents, self.scale, self.shift)
        # paste unmasked gt back (inference.py:104-105), then decode
        if crossfade > 0.0:
            s0 = round(mask_start * self.latent_sr)
            s1 = round(mask_end * self.latent_sr)
            xf = max(1, min(round(crossfade * self.latent_sr),
                            (s1 - s0) // 2))
            w = np.zeros(L, np.float32)
            w[s0:s1] = 1.0
            ramp = (np.arange(1, xf + 1, dtype=np.float32) / (xf + 1))
            w[s0 : s0 + xf] = ramp
            w[s1 - xf : s1] = ramp[::-1]
            wj = jnp.asarray(w)[None, :, None]
            pred = wj * pred + (1.0 - wj) * gt_latent
        else:
            pred = jnp.where(jnp.asarray(gt_mask), pred, gt_latent)
        wav = np.asarray(self.autoencoder.decode(pred))[0, :, 0]

        chunk = round((end_idx - start_idx) * sr)
        output_audio[round(start_idx * sr) : round(start_idx * sr) + chunk] = wav[:chunk]
        return sr, output_audio
