"""DAC (Descript Audio Codec) in flax — the second codec family behind the
Autoencoder facade (reference selects it via ``model_type='dac'``,
src/modules/autoencoder_wrapper.py:12).

Behavioral parity with reference ``src/modules/dac/``:
  * ``model/dac.py``: conv Encoder (Snake1d units, channel-doubling strided
    blocks) / Decoder (mirror with transposed convs, tanh output);
  * ``nn/quantize.py``: ``VectorQuantize`` with factorized + L2-normalized
    codes and straight-through estimator; ``ResidualVectorQuantize`` with
    per-sample quantizer dropout;
  * ``nn/layers.py``: plain snake ``x + sin^2(alpha x)/alpha``;
  * preprocess pads audio to a hop multiple; forward returns the audio and
    the VQ losses.

TPU notes: the RVQ codebook lookup is one (BT, D) x (D, N) matmul per
codebook (MXU) followed by an argmax; quantizer iteration is a Python loop
over the (static) n_codebooks, unrolled by XLA.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ezaudio_tpu.ops.convs import Conv1d, ConvTranspose1d


class Snake1d(nn.Module):
    """DAC snake: ``x + (1/(alpha+1e-9)) sin^2(alpha x)`` with linear-scale
    per-channel alpha initialized to one (nn/layers.py:18-33)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,), jnp.float32)
        a = alpha.astype(x.dtype)
        return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * x))


class ResidualUnit(nn.Module):
    dim: int
    dilation: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, dtype=self.dtype, name="act1")(x)
        y = Conv1d(self.dim, self.dim, 7, dilation=self.dilation, padding=pad,
                   weight_norm=self.use_weight_norm, dtype=self.dtype, name="conv1")(y)
        y = Snake1d(self.dim, dtype=self.dtype, name="act2")(y)
        y = Conv1d(self.dim, self.dim, 1, weight_norm=self.use_weight_norm,
                   dtype=self.dtype, name="conv2")(y)
        crop = (x.shape[1] - y.shape[1]) // 2
        if crop > 0:
            x = x[:, crop:-crop]
        return x + y


class EncoderBlock(nn.Module):
    dim: int
    stride: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(half, d, self.use_weight_norm, dtype=self.dtype,
                             name=f"res{i}")(x)
        x = Snake1d(half, dtype=self.dtype, name="act")(x)
        x = Conv1d(half, self.dim, 2 * self.stride, stride=self.stride,
                   padding=math.ceil(self.stride / 2),
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="down")(x)
        return x


class DACEncoder(nn.Module):
    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = Conv1d(1, d, 7, padding=3, weight_norm=self.use_weight_norm,
                   dtype=self.dtype, name="stem")(x)
        for i, s in enumerate(self.strides):
            d *= 2
            x = EncoderBlock(d, s, self.use_weight_norm, dtype=self.dtype,
                             name=f"block{i}")(x)
        x = Snake1d(d, dtype=self.dtype, name="act")(x)
        x = Conv1d(d, self.d_latent, 3, padding=1,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="head")(x)
        return x


class DecoderBlock(nn.Module):
    input_dim: int
    output_dim: int
    stride: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.input_dim, dtype=self.dtype, name="act")(x)
        x = ConvTranspose1d(self.input_dim, self.output_dim, 2 * self.stride,
                            stride=self.stride,
                            padding=math.ceil(self.stride / 2),
                            weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.output_dim, d, self.use_weight_norm,
                             dtype=self.dtype, name=f"res{i}")(x)
        return x


class DACDecoder(nn.Module):
    input_channel: int
    channels: int
    rates: Sequence[int]
    d_out: int = 1
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.input_channel, self.channels, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="stem")(x)
        out_dim = self.channels
        for i, s in enumerate(self.rates):
            in_dim = self.channels // 2**i
            out_dim = self.channels // 2 ** (i + 1)
            x = DecoderBlock(in_dim, out_dim, s, self.use_weight_norm,
                             dtype=self.dtype, name=f"block{i}")(x)
        x = Snake1d(out_dim, dtype=self.dtype, name="act")(x)
        x = Conv1d(out_dim, self.d_out, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="head")(x)
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

class VectorQuantize(nn.Module):
    """Factorized, L2-normalized VQ with straight-through gradients
    (nn/quantize.py:13-99)."""

    input_dim: int
    codebook_size: int
    codebook_dim: int
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.in_proj = Conv1d(self.input_dim, self.codebook_dim, 1,
                              weight_norm=self.use_weight_norm,
                              dtype=self.dtype, name="in_proj")
        self.out_proj = Conv1d(self.codebook_dim, self.input_dim, 1,
                               weight_norm=self.use_weight_norm,
                               dtype=self.dtype, name="out_proj")
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim), jnp.float32)

    def decode_latents(self, z_e):
        """(B, T, D) projected latents -> (quantized (B, T, D), indices (B, T))."""
        B, T, D = z_e.shape
        enc = z_e.reshape(B * T, D)
        enc_n = enc / jnp.maximum(jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12)
        cb = self.codebook.astype(z_e.dtype)
        cb_n = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12)
        # euclidean distance on normalized vectors == 2 - 2 cos; argmin ==
        # argmax of the similarity matmul (MXU)
        sim = jnp.dot(enc_n, cb_n.T, preferred_element_type=jnp.float32)
        indices = jnp.argmax(sim, axis=-1).reshape(B, T)
        z_q = cb[indices]
        return z_q, indices

    def decode_code(self, indices):
        return self.codebook.astype(self.dtype)[indices]

    def __call__(self, z):
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        commitment = jnp.mean(
            jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2))
        codebook_l = jnp.mean(
            jnp.square(z_q - jax.lax.stop_gradient(z_e)), axis=(1, 2))
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
        z_q = self.out_proj(z_q)
        return z_q, commitment, codebook_l, indices, z_e


class ResidualVectorQuantize(nn.Module):
    """SoundStream RVQ with quantizer dropout (nn/quantize.py:102-255)."""

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    use_weight_norm: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        dims = (self.codebook_dim if not isinstance(self.codebook_dim, int)
                else [self.codebook_dim] * self.n_codebooks)
        self.dims = list(dims)
        self.quantizers = [
            VectorQuantize(self.input_dim, self.codebook_size, dims[i],
                           self.use_weight_norm, dtype=self.dtype,
                           name=f"q{i}")
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None,
                 train: bool = False):
        """z (B, T, D).  Returns (z_q, codes (B, N, T), latents (B, T, sum D),
        commitment_loss, codebook_loss)."""
        B = z.shape[0]
        residual = z
        z_q = jnp.zeros_like(z)
        commitment_loss = 0.0
        codebook_loss = 0.0
        codes: List[jnp.ndarray] = []
        latents: List[jnp.ndarray] = []

        if train:
            # reference quantize.py:165-177: training ignores n_quantizers
            # and runs/supervises every codebook (minus quantizer dropout)
            nq = jnp.full((B,), self.n_codebooks + 1, jnp.float32)
            if self.quantizer_dropout > 0:
                # per-sample number of active quantizers (quantize.py:171-177)
                key = self.make_rng("dropout")
                drop = jax.random.randint(key, (B,), 1, self.n_codebooks + 1)
                n_dropout = int(B * self.quantizer_dropout)
                nq = nq.at[:n_dropout].set(drop[:n_dropout].astype(jnp.float32))
        else:
            nq = jnp.full((B,), float(n_quantizers or self.n_codebooks))

        for i, quantizer in enumerate(self.quantizers):
            if not train and n_quantizers is not None and i >= n_quantizers:
                break
            z_q_i, commit_i, cb_i, idx_i, z_e_i = quantizer(residual)
            mask = (i < nq).astype(z.dtype)
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i
            commitment_loss = commitment_loss + (commit_i * mask).mean()
            codebook_loss = codebook_loss + (cb_i * mask).mean()
            codes.append(idx_i)
            latents.append(z_e_i)

        return (z_q, jnp.stack(codes, axis=1),
                jnp.concatenate(latents, axis=-1),
                commitment_loss, codebook_loss)

    def from_codes(self, codes):
        """(B, N, T) indices -> (z_q (B,T,D), z_p (B,T,sumD), codes)."""
        z_q = 0.0
        z_p = []
        n = codes.shape[1]
        for i in range(n):
            z_p_i = self.quantizers[i].decode_code(codes[:, i])
            z_p.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), codes

    def from_latents(self, latents):
        """(B, T, sum D) projected latents -> re-quantized representation."""
        z_q = 0.0
        z_p = []
        codes = []
        dims = np.cumsum([0] + list(self.dims))
        # last boundary that fits: partial-width latents use only the
        # codebooks they fully cover (reference quantize.py from_latents)
        n = int(np.where(dims <= latents.shape[-1])[0].max())
        for i in range(n):
            z_p_i, codes_i = self.quantizers[i].decode_latents(
                latents[..., dims[i]:dims[i + 1]])
            z_p.append(z_p_i)
            codes.append(codes_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, jnp.concatenate(z_p, axis=-1), jnp.stack(codes, axis=1)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class DAC(nn.Module):
    encoder_dim: int = 64
    encoder_rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    sample_rate: int = 44100
    use_weight_norm: bool = False  # live v/g parameterization (training);
    # converted checkpoints fold weight norm into plain kernels
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def _latent_dim(self) -> int:
        return self.latent_dim or self.encoder_dim * (2 ** len(self.encoder_rates))

    def setup(self):
        self.encoder = DACEncoder(self.encoder_dim, self.encoder_rates,
                                  self._latent_dim, self.use_weight_norm,
                                  dtype=self.dtype)
        self.quantizer = ResidualVectorQuantize(
            input_dim=self._latent_dim, n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size, codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout,
            use_weight_norm=self.use_weight_norm, dtype=self.dtype)
        self.decoder = DACDecoder(self._latent_dim, self.decoder_dim,
                                  self.decoder_rates, use_weight_norm=self.use_weight_norm,
                                  dtype=self.dtype)

    def preprocess(self, audio):
        T = audio.shape[1]
        pad = (math.ceil(T / self.hop_length) * self.hop_length) - T
        return jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))

    def encode(self, audio, n_quantizers: Optional[int] = None,
               train: bool = False):
        z = self.encoder(audio)
        return self.quantizer(z, n_quantizers, train=train)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, audio, n_quantizers: Optional[int] = None,
                 train: bool = False):
        """audio (B, T, 1) -> dict with reconstructed audio + VQ losses."""
        length = audio.shape[1]
        audio = self.preprocess(audio)
        z, codes, latents, commitment, codebook = self.encode(
            audio, n_quantizers, train=train)
        out = self.decode(z)
        return {
            "audio": out[:, :length],
            "z": z,
            "codes": codes,
            "latents": latents,
            "vq/commitment_loss": commitment,
            "vq/codebook_loss": codebook,
        }
