"""Timestep / positional embeddings and patch projection.

Parity targets in reference ``src/models/utils/modules.py``:
  * ``timestep_embedding`` (:19-37) — cos-first sinusoidal embedding.
  * ``TimestepEmbedder`` (:40-61) — Linear/SiLU/Linear MLP on a 256-dim
    frequency embedding.
  * ``patchify``/``unpatchify`` 1d (:64-85) and ``PatchEmbed`` (:88-111).
  * ``SinusoidalPositionalEncoding`` (:138-158) — sin-first interleaved.
  * ``PE_wrapper`` (:161-193) — abs / conv / sinu / none.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.ops.convs import Conv1d, xavier_linear


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding: ``[cos(t f) | sin(t f)]``.

    ``t``: (B,) possibly-fractional timesteps.  Matches modules.py:19-37
    (note: cos first, unlike the usual DDPM sin-first convention).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    out_size: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        out = self.out_size or self.hidden_size
        h = timestep_embedding(t, self.frequency_embedding_size).astype(self.dtype)
        h = xavier_linear(self.frequency_embedding_size, self.hidden_size,
                          dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        h = xavier_linear(self.hidden_size, out, dtype=self.dtype, name="fc2")(h)
        return h


class MLPEmbedder(nn.Module):
    """Linear/SiLU/Linear projector (context_embed / cls_embed in udit.py)."""

    in_dim: int
    dim: int
    dtype: jnp.dtype = jnp.float32
    zero_out: bool = False

    @nn.compact
    def __call__(self, x):
        h = xavier_linear(self.in_dim, self.dim, dtype=self.dtype, name="fc1")(x)
        h = nn.silu(h)
        if self.zero_out:
            from ezaudio_tpu.ops.convs import zero_linear

            h = zero_linear(self.dim, self.dim, dtype=self.dtype, name="fc2")(h)
        else:
            h = xavier_linear(self.dim, self.dim, dtype=self.dtype, name="fc2")(h)
        return h


class PatchEmbed1D(nn.Module):
    """1D patch embedding: strided Conv1d == per-patch linear projection.

    With the EzAudio config (patch_size=1) this is exactly a Linear over
    channels; we keep the general strided form for other patch sizes.
    Weights are initialized xavier-uniform over the flattened (out, in*k)
    view, matching udit.py ``initialize_weights``.
    """

    patch_size: int
    in_chans: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C) -> (B, T // p, D)
        B, T, C = x.shape
        p = self.patch_size
        assert T % p == 0, f"sequence length {T} not divisible by patch {p}"
        x = x.reshape(B, T // p, p * C)

        def init(key, shape, dtype=jnp.float32):
            # xavier-uniform over (fan_in = p*C, fan_out = D)
            return nn.initializers.xavier_uniform()(key, shape, dtype)

        kernel = self.param("kernel", init, (p * C, self.embed_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        return (
            jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
            + bias.astype(self.dtype)
        )


def patchify_1d(x, patch_size: int):
    """(B, T, C) -> (B, T/p, p*C).  Channel-last analog of modules.py:64-70.

    Note the reference packs channel-major within a patch
    (``B C (h p1) -> B h (p1 C)``): element order inside a patch is
    [t0c0..t0cC, t1c0..t1cC, ...] — identical to a plain reshape of
    channel-last data, so no permutation is needed in this layout.
    """
    B, T, C = x.shape
    return x.reshape(B, T // patch_size, patch_size * C)


def unpatchify_1d(x, channels: int):
    """(B, L, p*C) -> (B, L*p, C)."""
    B, L, PC = x.shape
    p = PC // channels
    return x.reshape(B, L * p, channels)


def patchify_2d(x, patch_size: int):
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C), channel-last analog of
    modules.py:64-68 (patch-major packing matches a plain reshape here)."""
    B, H, W, C = x.shape
    p = patch_size
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, w, p, p, C)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify_2d(x, channels: int, img_size):
    """(B, h*w, p*p*C) -> (B, H, W, C)."""
    B, L, PPC = x.shape
    p = int((PPC // channels) ** 0.5)
    H, W = img_size
    h, w = H // p, W // p
    x = x.reshape(B, h, w, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, channels)


class PatchEmbed2D(nn.Module):
    """2D patch embedding (modules.py PatchEmbed input_type='2d')."""

    patch_size: int
    in_chans: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = patchify_2d(x, self.patch_size)
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (self.patch_size**2 * self.in_chans, self.embed_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        return (jnp.dot(h.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
                + bias.astype(self.dtype))


class SinusoidalPE(nn.Module):
    """Interleaved sin/cos absolute PE added to the input (modules.py:138-158)."""

    dim: int
    length: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        position = jnp.arange(self.length, dtype=jnp.float32)[:, None]
        div = jnp.exp(
            jnp.arange(0, self.dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / self.dim)
        )
        pe = jnp.zeros((self.length, self.dim))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div))
        self.pe = pe

    def __call__(self, x):
        L = x.shape[1]
        return x + self.pe[None, :L].astype(x.dtype)


class PositionalConvEmbedding(nn.Module):
    """HuBERT-style grouped conv PE (modules.py:114-135), weight-normalized."""

    dim: int
    kernel_size: int = 128
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv1d(
            in_channels=self.dim,
            out_channels=self.dim,
            kernel_size=self.kernel_size,
            padding=self.kernel_size // 2,
            groups=self.groups,
            weight_norm=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        h = nn.gelu(h[:, :-1, :], approximate=False)
        return h


class PEWrapper(nn.Module):
    """abs / conv / sinu / none positional embedding switch (modules.py:161-193)."""

    dim: int
    method: str = "abs"
    length: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.method == "abs":
            pe = self.param(
                "abs_pe",
                nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
                (1, self.length, self.dim),
                jnp.float32,
            )
            L = x.shape[1]
            return x + pe[:, :L].astype(x.dtype)
        if self.method == "conv":
            return x + PositionalConvEmbedding(dim=self.dim, dtype=self.dtype, name="conv_pe")(x)
        if self.method == "sinu":
            return SinusoidalPE(dim=self.dim, length=self.length, dtype=self.dtype, name="sinu_pe")(x)
        if self.method == "none":
            return x
        raise NotImplementedError(self.method)
