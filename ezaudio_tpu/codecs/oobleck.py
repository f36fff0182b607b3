"""Oobleck convolutional VAE (stable-audio-tools style) in flax, channel-last.

Behavioral parity with reference
``src/modules/stable_vae/models/autoencoders.py``:
  * Encoder: WNConv stem (k7) -> per-stride EncoderBlock
    [3 dilated ResidualUnits (1,3,9) + snake + strided WNConv(k=2s, p=ceil(s/2))]
    -> snake -> WNConv(k3) to 2*latent_dim (mean || scale);
  * Decoder: WNConv stem (k7) -> per-stride DecoderBlock
    [snake + WNConvTranspose(k=2s, p=ceil(s/2)) + 3 ResidualUnits]
    -> snake -> WNConv(k7, no bias) -> optional tanh;
  * SnakeBeta activation with log-scale trainable per-channel alpha/beta
    (``blocks.py:328+``);
  * VAE bottleneck: softplus stdev reparameterization
    (``bottleneck.py:54-90``).

EzAudio geometry (ckpts/vae/config.json): channels 128, c_mults [1,2,4,8],
strides [2,4,6,10] => x480 downsample; 24 kHz mono -> 128 ch @ 50 Hz.

TPU notes: all convs run channel-last; the snake activation is a cheap VPU
epilogue XLA fuses into the surrounding convs.  Weight norm is folded into
plain kernels at checkpoint-conversion time (``use_weight_norm=False``); the
live two-parameter form is available for VAE training parity.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.ops.activations import snake_beta_vae
from ezaudio_tpu.ops.convs import Conv1d, ConvTranspose1d


class SnakeBeta(nn.Module):
    """Per-channel log-scale snake: exp'd alpha/beta, x + 1/b sin^2(a x)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.channels,), jnp.float32)
        a = jnp.exp(alpha).astype(x.dtype)
        b = jnp.exp(beta).astype(x.dtype)
        return snake_beta_vae(x, a, b)


class ResidualUnit(nn.Module):
    channels: int
    dilation: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.dilation * (7 - 1)) // 2
        h = SnakeBeta(self.channels, dtype=self.dtype, name="act1")(x)
        h = Conv1d(self.channels, self.channels, 7, dilation=self.dilation,
                   padding=pad, weight_norm=self.use_weight_norm,
                   dtype=self.dtype, name="conv1")(h)
        h = SnakeBeta(self.channels, dtype=self.dtype, name="act2")(h)
        h = Conv1d(self.channels, self.channels, 1,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="conv2")(h)
        return x + h


class EncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.in_channels, d, self.use_weight_norm,
                             dtype=self.dtype, name=f"res{i}")(x)
        x = SnakeBeta(self.in_channels, dtype=self.dtype, name="act")(x)
        x = Conv1d(self.in_channels, self.out_channels, 2 * self.stride,
                   stride=self.stride, padding=math.ceil(self.stride / 2),
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="down")(x)
        return x


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SnakeBeta(self.in_channels, dtype=self.dtype, name="act")(x)
        x = ConvTranspose1d(self.in_channels, self.out_channels,
                            2 * self.stride, stride=self.stride,
                            padding=math.ceil(self.stride / 2),
                            weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_channels, d, self.use_weight_norm,
                             dtype=self.dtype, name=f"res{i}")(x)
        return x


class OobleckEncoder(nn.Module):
    in_channels: int = 1
    channels: int = 128
    latent_dim: int = 256  # NOTE: 2*latent for the VAE head (mean || scale)
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 6, 10)
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, in_channels) -> (B, T/prod(strides), latent_dim)."""
        mults = (1,) + tuple(self.c_mults)
        x = Conv1d(self.in_channels, mults[0] * self.channels, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="stem")(x)
        for i, s in enumerate(self.strides):
            x = EncoderBlock(mults[i] * self.channels,
                             mults[i + 1] * self.channels, s,
                             self.use_weight_norm, dtype=self.dtype,
                             name=f"block{i}")(x)
        x = SnakeBeta(mults[-1] * self.channels, dtype=self.dtype, name="act")(x)
        x = Conv1d(mults[-1] * self.channels, self.latent_dim, 3, padding=1,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="head")(x)
        return x


class OobleckDecoder(nn.Module):
    out_channels: int = 1
    channels: int = 128
    latent_dim: int = 128
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 6, 10)
    final_tanh: bool = False
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        """(B, L, latent_dim) -> (B, L*prod(strides), out_channels)."""
        mults = (1,) + tuple(self.c_mults)
        x = Conv1d(self.latent_dim, mults[-1] * self.channels, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="stem")(z)
        n = len(self.strides)
        for j, i in enumerate(range(n, 0, -1)):
            x = DecoderBlock(mults[i] * self.channels,
                             mults[i - 1] * self.channels,
                             self.strides[i - 1], self.use_weight_norm,
                             dtype=self.dtype, name=f"block{j}")(x)
        x = SnakeBeta(mults[0] * self.channels, dtype=self.dtype, name="act")(x)
        x = Conv1d(mults[0] * self.channels, self.out_channels, 7, padding=3,
                   use_bias=False, weight_norm=self.use_weight_norm,
                   dtype=self.dtype, name="head")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


def vae_sample(key, mean_scale, sample: bool = True):
    """VAEBottleneck.encode (bottleneck.py:54-90): split mean||scale on the
    channel axis, stdev = softplus(scale) + 1e-4, reparameterize."""
    mean, scale = jnp.split(mean_scale, 2, axis=-1)
    stdev = jax.nn.softplus(scale) + 1e-4
    if not sample:
        return mean
    return mean + stdev * jax.random.normal(key, mean.shape, mean.dtype)


def vae_kl(mean_scale):
    """KL term matching ``vae_sample_kl`` (bottleneck.py:54-63):
    sum over channels of (m^2 + var - log var - 1), mean over the rest."""
    mean, scale = jnp.split(mean_scale, 2, axis=-1)
    stdev = jax.nn.softplus(scale) + 1e-4
    var = stdev * stdev
    logvar = jnp.log(var)
    kl = jnp.sum(mean * mean + var - logvar - 1.0, axis=-1)
    return jnp.mean(kl)


class AudioVAE(nn.Module):
    """Encoder + VAE bottleneck + decoder, mirroring ``AudioAutoencoder``
    (autoencoders.py:229-559) for the Oobleck/vae configuration."""

    io_channels: int = 1
    channels: int = 128
    latent_dim: int = 128
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 6, 10)
    final_tanh: bool = False
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @property
    def downsampling_ratio(self) -> int:
        r = 1
        for s in self.strides:
            r *= s
        return r

    def setup(self):
        self.encoder = OobleckEncoder(
            in_channels=self.io_channels, channels=self.channels,
            latent_dim=2 * self.latent_dim, c_mults=self.c_mults,
            strides=self.strides, use_weight_norm=self.use_weight_norm,
            dtype=self.dtype)
        self.decoder = OobleckDecoder(
            out_channels=self.io_channels, channels=self.channels,
            latent_dim=self.latent_dim, c_mults=self.c_mults,
            strides=self.strides, final_tanh=self.final_tanh,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype)

    def encode(self, audio, sample: bool = True, return_kl: bool = False):
        """audio (B, T, 1) -> latent (B, T/480, latent_dim)."""
        ms = self.encoder(audio)
        z = vae_sample(self.make_rng("sample") if sample else None, ms, sample=sample)
        if return_kl:
            return z, vae_kl(ms)
        return z

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, audio, sample: bool = True):
        """Full round trip (training path): returns (recon, kl)."""
        ms = self.encoder(audio)
        z = vae_sample(self.make_rng("sample") if sample else None, ms, sample=sample)
        return self.decoder(z), vae_kl(ms)


def vae_from_config(cfg: dict, dtype=jnp.float32, use_weight_norm=False) -> AudioVAE:
    """Build from a reference-format vae config.json dict."""
    m = cfg["model"]
    enc = m["encoder"]["config"]
    dec = m["decoder"]["config"]
    assert m["bottleneck"]["type"] == "vae"
    return AudioVAE(
        io_channels=m.get("io_channels", 1),
        channels=enc["channels"],
        latent_dim=m["latent_dim"],
        c_mults=tuple(enc["c_mults"]),
        strides=tuple(enc["strides"]),
        final_tanh=dec.get("final_tanh", False),
        use_weight_norm=use_weight_norm,
        dtype=dtype,
    )
