"""Codec (VAE / DAC) adversarial training.

The reference ships the codec training recipe as config + loss library
(``ckpts/vae/config.json`` ``training:`` block; ``src/modules/dac/nn/loss.py``)
— the actual loop lives upstream in stable-audio-tools/descript.  This
module is the TPU-native loop for both codec families:

  generator loss  = mrstft (multi-scale STFT, perceptual-weighted windows)
                  + lambda_kl * KL          (VAE)   [config: 1e-4]
                  | commitment/codebook     (DAC)   [0.25 / 1.0]
                  + lambda_adv * adversarial + lambda_fm * feature matching
  discriminator   = least-squares real/fake on MPD/MRD fmaps

Two optimizers (AdamW betas (0.8, 0.99), InverseLR schedule per the vae
config), alternating jitted steps; both steps shard the batch over dp.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ezaudio_tpu.audio.metrics import multiscale_stft_loss
from ezaudio_tpu.codecs.discriminator import (
    Discriminator, discriminator_loss, generator_loss)


def inverse_lr(base_lr: float, inv_gamma: float, power: float,
               warmup: float = 0.0):
    """InverseLR schedule (vae config.json training.scheduler): a
    1/(1+step/gamma)^power decay with exponential warmup factor
    ``1 - warmup^(step+1)``."""

    def fn(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        lr = base_lr * (1.0 + s / inv_gamma) ** (-power)
        if warmup > 0:
            lr = lr * (1.0 - warmup ** (s + 1.0))
        return lr

    return fn


class CodecTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_opt: Any


def make_codec_train_steps(
    codec,                       # AudioVAE or DAC flax module
    disc: Discriminator,
    codec_kind: str = "vae",     # 'vae' | 'dac'
    sample_rate: int = 24000,
    lambda_mrstft: float = 1.0,
    lambda_kl: float = 1e-4,
    lambda_adv: float = 0.1,
    lambda_fm: float = 5.0,
    lambda_commit: float = 0.25,
    lambda_codebook: float = 1.0,
    gen_lr: float = 1.5e-4,
    disc_lr: float = 3e-4,
    weight_decay: float = 1e-3,
    inv_gamma: float = 200000.0,
    power: float = 0.5,
    warmup: float = 0.999,
    stft_windows: Tuple[int, ...] = (2048, 1024, 512, 256, 128, 64, 32),
) -> Tuple[Callable, optax.GradientTransformation, optax.GradientTransformation]:
    """Build one alternating jitted step: (state, audio, rng) ->
    (state, metrics).  The generator and discriminator update in the same
    compiled program (generator sees the current discriminator, then the
    discriminator trains against the detached reconstruction)."""

    gen_tx = optax.adamw(inverse_lr(gen_lr, inv_gamma, power, warmup),
                         b1=0.8, b2=0.99, weight_decay=weight_decay)
    disc_tx = optax.adamw(inverse_lr(disc_lr, inv_gamma, power, warmup),
                          b1=0.8, b2=0.99, weight_decay=weight_decay)

    def reconstruct(gen_params, audio, rng):
        if codec_kind == "vae":
            recon, kl = codec.apply({"params": gen_params}, audio,
                                    rngs={"sample": rng})
            aux = {"kl": kl}
            extra = lambda_kl * kl
        else:
            out = codec.apply({"params": gen_params}, audio, train=True,
                              rngs={"dropout": rng})
            recon = out["audio"]
            aux = {"commitment": out["vq/commitment_loss"],
                   "codebook": out["vq/codebook_loss"]}
            extra = (lambda_commit * out["vq/commitment_loss"]
                     + lambda_codebook * out["vq/codebook_loss"])
        return recon, extra, aux

    def gen_loss_fn(gen_params, disc_params, audio, rng):
        recon, extra, aux = reconstruct(gen_params, audio, rng)
        n = min(recon.shape[1], audio.shape[1])
        recon, ref = recon[:, :n], audio[:, :n]

        mrstft = multiscale_stft_loss(recon[..., 0], ref[..., 0],
                                      window_lengths=stft_windows)
        d_fake = disc.apply({"params": disc_params}, recon)
        d_real = disc.apply({"params": disc_params}, ref)
        adv, fm = generator_loss(d_fake, d_real)

        loss = (lambda_mrstft * mrstft + extra
                + lambda_adv * adv + lambda_fm * fm)
        metrics = {"gen/loss": loss, "gen/mrstft": mrstft, "gen/adv": adv,
                   "gen/fm": fm, **{f"gen/{k}": v for k, v in aux.items()}}
        return loss, (metrics, recon)

    def disc_loss_fn(disc_params, recon, audio):
        n = min(recon.shape[1], audio.shape[1])
        d_fake = disc.apply({"params": disc_params},
                            jax.lax.stop_gradient(recon[:, :n]))
        d_real = disc.apply({"params": disc_params}, audio[:, :n])
        return discriminator_loss(d_fake, d_real)

    # state donated: gen/disc params + both optimizers alias into the
    # updated state instead of doubling peak HBM
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: CodecTrainState, audio, rng):
        rng = jax.random.fold_in(rng, state.step)

        (gl, (metrics, recon)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, state.disc_params,
                                       audio, rng)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        dl, d_grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params, recon, audio)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics = {**metrics, "disc/loss": dl}
        new_state = CodecTrainState(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt)
        return new_state, metrics

    def step(state: CodecTrainState, audio, rng):
        # int8 quant is inference-only (round has no gradient): force it off
        # at trace time even if EZAUDIO_QUANT is set in the environment.
        from ezaudio_tpu.ops.quant import quant_context

        with quant_context("off"):
            return _step(state, audio, rng)

    return step, gen_tx, disc_tx


def init_codec_train_state(codec, disc, gen_tx, disc_tx, key,
                           example_audio,
                           gen_params=None) -> CodecTrainState:
    """``gen_params`` warm-starts the generator from an existing tree
    (e.g. fine-tuning a converted checkpoint or a facade's live params)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if gen_params is None:
        gen_params = codec.init({"params": k1, "sample": k1, "dropout": k1},
                                example_audio)["params"]
    disc_vars = disc.init(k2, example_audio)
    gp, dp = gen_params, disc_vars["params"]
    return CodecTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gp, gen_opt=gen_tx.init(gp),
        disc_params=dp, disc_opt=disc_tx.init(dp))
