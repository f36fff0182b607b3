"""Normalization layers.

Parity notes:
  * ``LayerNorm`` matches ``torch.nn.LayerNorm`` (eps 1e-5, affine) used
    throughout the reference DiT (``src/models/udit.py``, ``blocks.py``).
  * ``RMSNorm`` matches the reference LLaMA-style RMSNorm
    (``src/models/utils/modules.py:196-239``): normalize in float32, cast
    back, then multiply by the learned weight.

Both normalize over the trailing feature axis only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * w + b
        return y.astype(self.dtype)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        # Reference casts back to input dtype *before* the weight multiply
        # (modules.py:236-239); with float32 params the result is float32
        # either way, but we keep the op order for bf16 parity.
        y = y.astype(x.dtype) * w
        return y.astype(self.dtype)


def make_norm(kind: str, dim: int, dtype=jnp.float32, name=None) -> nn.Module:
    """Factory mirroring the reference's ``norm_layer`` string switch."""
    if kind in ("layernorm", "layer_norm"):
        return LayerNorm(dim=dim, dtype=dtype, name=name)
    if kind in ("rmsnorm", "rms_norm"):
        return RMSNorm(dim=dim, dtype=dtype, name=name)
    raise NotImplementedError(f"unknown norm: {kind}")
