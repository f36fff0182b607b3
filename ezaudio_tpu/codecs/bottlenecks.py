"""Bottleneck zoo for the stable-VAE codec family.

Parity with reference ``src/modules/stable_vae/models/bottleneck.py``
(:10-346).  The production EzAudio bottleneck is ``vae`` (implemented in
``codecs/oobleck.py``); the remaining variants exist in the reference as
alternatives and are provided here:

  * ``TanhBottleneck``        (:35-48)
  * ``L2Bottleneck``          (l2-normalized continuous codes)
  * ``WassersteinBottleneck`` (:93-135: MMD regularizer)
  * ``RVQBottleneck``         (residual VQ — reuses the DAC RVQ)
  * ``FSQBottleneck``         (finite scalar quantization, arXiv 2309.15505)

All operate channel-last: encode (B, L, C_enc) -> (B, L, C), decode is
identity (or code lookup for discrete variants).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.codecs.dac import ResidualVectorQuantize


class TanhBottleneck(nn.Module):
    def encode(self, x, **kw):
        return jnp.tanh(x), {}

    def decode(self, x):
        return x


class L2Bottleneck(nn.Module):
    def encode(self, x, **kw):
        n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return n, {}

    def decode(self, x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def _mmd(latents: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Maximum mean discrepancy against N(0, I) with an RBF kernel
    (bottleneck.py compute_mmd)."""
    z = latents.reshape(-1, latents.shape[-1])
    noise = jax.random.normal(key, z.shape, z.dtype)

    def mean_kernel(a, b):
        d = jnp.mean(jnp.square(a[:, None] - b[None]), axis=2) / a.shape[-1]
        return jnp.mean(jnp.exp(-d))

    return mean_kernel(z, z) + mean_kernel(noise, noise) - 2 * mean_kernel(z, noise)


class WassersteinBottleneck(nn.Module):
    noise_augment_dim: int = 0

    def encode(self, x, key=None, return_info: bool = False):
        info = {}
        if return_info and key is not None:
            info["mmd"] = _mmd(x, key)
        return x, info

    def decode(self, x):
        return x


class RVQBottleneck(nn.Module):
    """Residual VQ bottleneck over the encoder output channels."""

    input_dim: int
    n_codebooks: int = 8
    codebook_size: int = 1024
    codebook_dim: int = 8
    dtype: Any = jnp.float32

    def setup(self):
        self.rvq = ResidualVectorQuantize(
            input_dim=self.input_dim, n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size, codebook_dim=self.codebook_dim,
            dtype=self.dtype)

    def encode(self, x, **kw):
        z_q, codes, latents, commit, cb = self.rvq(x)
        return z_q, {"codes": codes, "commitment_loss": commit,
                     "codebook_loss": cb}

    def decode(self, x):
        return x

    def decode_tokens(self, codes):
        return self.rvq.from_codes(codes)[0]


class FSQBottleneck(nn.Module):
    """Finite scalar quantization (arXiv 2309.15505): round each channel to
    an ``l``-point grid with straight-through gradients.  Even levels use
    the standard half-offset bounding so rounding yields exactly ``l``
    integer values."""

    levels: Sequence[int] = (8, 5, 5, 5)

    def _bound(self, z):
        lv = jnp.asarray(self.levels, z.dtype)
        # official FSQ bound (google-research fsq): 1-eps span shrink and a
        # tan() shift — an arctanh() shift NaNs on binary channels (l=2:
        # offset/half_l >= 1), pinning them to a constant code
        half_l = (lv - 1.0) * (1.0 - 1e-3) / 2.0
        offset = jnp.where(jnp.asarray(self.levels) % 2 == 0, 0.5, 0.0)
        shift = jnp.tan(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def encode(self, x, **kw):
        assert x.shape[-1] == len(self.levels), (
            f"FSQ expects {len(self.levels)} channels, got {x.shape[-1]}")
        b = self._bound(x)
        q = jnp.round(b)
        q = b + jax.lax.stop_gradient(q - b)
        lv = jnp.asarray(self.levels, x.dtype)
        width = lv // 2  # normalizer (FSQ convention)
        out = q / width
        digits = jnp.round(jax.lax.stop_gradient(q)).astype(jnp.int32) + (
            jnp.asarray(self.levels, jnp.int32) // 2)
        basis = jnp.cumprod(jnp.asarray((1,) + tuple(self.levels[:-1])))
        tokens = jnp.sum(digits * basis, axis=-1)
        return out, {"codes": tokens}

    def decode(self, x):
        return x

    def decode_tokens(self, tokens):
        basis = jnp.cumprod(jnp.asarray((1,) + tuple(self.levels[:-1])))
        lv = jnp.asarray(self.levels, jnp.int32)
        digits = (tokens[..., None] // basis) % lv
        width = lv // 2
        return (digits - width).astype(jnp.float32) / width


def make_bottleneck(kind: str, **kw):
    """Factory mirroring the reference's bottleneck config switch."""
    return {
        "tanh": TanhBottleneck,
        "l2": L2Bottleneck,
        "wasserstein": WassersteinBottleneck,
        "rvq": RVQBottleneck,
        "fsq": FSQBottleneck,
    }[kind](**kw)
