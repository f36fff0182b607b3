"""EnCodec-style codec: SEANet encoder/decoder + plain residual VQ.

The reference supports ``model_type='encodec'`` in its Autoencoder facade
(autoencoder_wrapper.py:49-66) by wrapping the external ``encodec``
package (also compare/encodec.py).  This is a from-scratch flax
implementation of that architecture (Defossez et al., arXiv 2210.13438):

  * SEANet encoder: Conv stem -> per-stride [residual unit (ELU convs) +
    strided downsample] with channel doubling -> 2-layer LSTM -> final conv
    to latent_dim; strides (2, 4, 5, 8) => x320 hop at 24 kHz (75 Hz);
  * decoder mirrors with transposed convs;
  * quantizer: plain residual VQ — full-dimension codebooks, nearest
    neighbour by L2 (no factorized projection, unlike DAC), straight-through
    estimator, commitment loss;
  * weight-norm convs (as upstream encodec's norm='weight_norm' variant).

TPU notes: the LSTM is a `lax.scan` over time (75 Hz latent rate keeps it
cheap: 750 steps per 10 s clip, hidden 512-ish); everything else is conv
(MXU) like the other codec families.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ezaudio_tpu.ops.convs import Conv1d, ConvTranspose1d


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    use_weight_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = Conv1d(self.dim, hidden, 3, padding=1,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="conv1")(h)
        h = nn.elu(h)
        h = Conv1d(hidden, self.dim, 1, weight_norm=self.use_weight_norm,
                   dtype=self.dtype, name="conv2")(h)
        return x + h


class LSTMStack(nn.Module):
    """2-layer LSTM over (B, T, C) with a residual connection (SEANet's
    ``lstm`` block).  Implemented as nn.scan over an OptimizedLSTMCell."""

    features: int
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.features, dtype=self.dtype,
                                        param_dtype=jnp.float32,
                                        name=f"lstm{i}")
            scan = nn.RNN(cell, name=f"rnn{i}")
            h = scan(h)
        return x + h


class SEANetEncoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)  # applied reversed on encode
    n_residual_layers: int = 1
    use_lstm: bool = True
    use_weight_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, channels) -> (B, T / prod(ratios), dimension)."""
        mult = 1
        h = Conv1d(self.channels, mult * self.n_filters, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="stem")(x)
        for i, ratio in enumerate(reversed(self.ratios)):
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(mult * self.n_filters,
                                      use_weight_norm=self.use_weight_norm,
                                      dtype=self.dtype, name=f"res{i}_{j}")(h)
            h = nn.elu(h)
            h = Conv1d(mult * self.n_filters, mult * self.n_filters * 2,
                       2 * ratio, stride=ratio, padding=math.ceil(ratio / 2),
                       weight_norm=self.use_weight_norm, dtype=self.dtype,
                       name=f"down{i}")(h)
            mult *= 2
        if self.use_lstm:
            h = LSTMStack(mult * self.n_filters, dtype=self.dtype, name="lstm")(h)
        h = nn.elu(h)
        h = Conv1d(mult * self.n_filters, self.dimension, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="head")(h)
        return h


class SEANetDecoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    use_lstm: bool = True
    use_weight_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        mult = 2 ** len(self.ratios)
        h = Conv1d(self.dimension, mult * self.n_filters, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="stem")(z)
        if self.use_lstm:
            h = LSTMStack(mult * self.n_filters, dtype=self.dtype, name="lstm")(h)
        for i, ratio in enumerate(self.ratios):
            h = nn.elu(h)
            L_in = h.shape[1]
            # full (L-1)*r + 2r output, then trim r samples asymmetrically
            # (ceil left / floor right, upstream encodec's unpad) so each
            # stage emits exactly r*L — a symmetric ceil(r/2) pad over-trims
            # odd ratios by one and the deficit multiplies through the
            # remaining upsampling
            h = ConvTranspose1d(mult * self.n_filters,
                                mult * self.n_filters // 2, 2 * ratio,
                                stride=ratio, padding=0,
                                weight_norm=self.use_weight_norm,
                                dtype=self.dtype, name=f"up{i}")(h)
            left = ratio - ratio // 2
            h = h[:, left : left + ratio * L_in]
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(mult * self.n_filters // 2,
                                      use_weight_norm=self.use_weight_norm,
                                      dtype=self.dtype, name=f"res{i}_{j}")(h)
            mult //= 2
        h = nn.elu(h)
        h = Conv1d(self.n_filters, self.channels, 7, padding=3,
                   weight_norm=self.use_weight_norm, dtype=self.dtype,
                   name="head")(h)
        return h


class EncodecVQ(nn.Module):
    """Plain (non-factorized) VQ codebook at full latent dimension."""

    dim: int
    codebook_size: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.codebook = self.param("codebook", nn.initializers.normal(1.0),
                                   (self.codebook_size, self.dim), jnp.float32)

    def __call__(self, z):
        B, T, D = z.shape
        flat = z.reshape(B * T, D)
        cb = self.codebook.astype(z.dtype)
        d = (jnp.sum(flat**2, axis=1, keepdims=True)
             - 2 * jnp.dot(flat, cb.T, preferred_element_type=jnp.float32)
             + jnp.sum(cb**2, axis=1)[None])
        idx = jnp.argmin(d, axis=1).reshape(B, T)
        z_q = cb[idx]
        commit = jnp.mean(jnp.square(z - jax.lax.stop_gradient(z_q)))
        # codebook loss pulls the selected codes toward the (frozen)
        # encoder output — the gradient path that trains the codebooks
        # (VQ-VAE form; upstream encodec uses EMA updates instead, which
        # don't fit a pure-functional grad step — same fixed points)
        codebook = jnp.mean(jnp.square(jax.lax.stop_gradient(z) - z_q))
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, idx, commit, codebook

    def decode(self, idx):
        return self.codebook.astype(self.dtype)[idx]


class EncodecRVQ(nn.Module):
    dim: int
    n_q: int = 8
    codebook_size: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [EncodecVQ(self.dim, self.codebook_size,
                                 dtype=self.dtype, name=f"vq{i}")
                       for i in range(self.n_q)]

    def _check_n_q(self, n_q: Optional[int]) -> int:
        n = self.n_q if n_q is None else int(n_q)
        if not 1 <= n <= self.n_q:
            raise ValueError(f"n_q must be in [1, {self.n_q}], got {n_q}")
        return n

    def encode(self, z, n_q: Optional[int] = None):
        """-> codes (B, N, T)."""
        n = self._check_n_q(n_q)
        residual = z
        codes = []
        for i in range(n):
            z_q, idx, _, _ = self.layers[i](residual)
            residual = residual - z_q
            codes.append(idx)
        return jnp.stack(codes, axis=1)

    def decode(self, codes):
        z = 0.0
        for i in range(codes.shape[1]):
            z = z + self.layers[i].decode(codes[:, i])
        return z

    def __call__(self, z, n_q: Optional[int] = None):
        n = self._check_n_q(n_q)
        residual = z
        z_q = jnp.zeros_like(z)
        commit = 0.0
        codebook = 0.0
        codes = []
        for i in range(n):
            q_i, idx, c_i, cb_i = self.layers[i](residual)
            residual = residual - q_i
            z_q = z_q + q_i
            commit = commit + c_i
            codebook = codebook + cb_i
            codes.append(idx)
        return z_q, jnp.stack(codes, axis=1), commit, codebook


class Encodec(nn.Module):
    """Full EnCodec model behind the facade's 'encodec' slot."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    n_q: int = 8
    codebook_size: int = 1024
    sample_rate: int = 24000
    use_lstm: bool = True
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    def setup(self):
        self.encoder = SEANetEncoder(
            self.channels, self.dimension, self.n_filters, self.ratios,
            use_lstm=self.use_lstm, dtype=self.dtype)
        self.decoder = SEANetDecoder(
            self.channels, self.dimension, self.n_filters, self.ratios,
            use_lstm=self.use_lstm, dtype=self.dtype)
        self.quantizer = EncodecRVQ(self.dimension, self.n_q,
                                    self.codebook_size, dtype=self.dtype)

    def encode(self, audio, n_q: Optional[int] = None):
        """(B, T, 1) -> codes (B, N, T/hop)."""
        return self.quantizer.encode(self.encoder(audio), n_q)

    def decode(self, codes):
        return self.decoder(self.quantizer.decode(codes))

    def __call__(self, audio, n_q: Optional[int] = None):
        z = self.encoder(audio)
        z_q, codes, commit, codebook = self.quantizer(z, n_q)
        out = self.decoder(z_q)
        return {"audio": out[:, : audio.shape[1]], "codes": codes,
                "z": z_q, "commitment_loss": commit,
                # codec_trainer's VQ branch reads the namespaced keys
                "vq/commitment_loss": commit, "vq/codebook_loss": codebook}
