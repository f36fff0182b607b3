"""Activation functions and gated projections.

Parity notes (reference ``src/models/utils/modules.py:242-325`` and
``src/modules/stable_vae/models/blocks.py:317-358``):
  * ``gelu`` exact (erf) form — torch ``F.gelu`` default.
  * ``gelu_tanh`` — torch ``F.gelu(approximate='tanh')`` / HF ``gelu_new``.
  * ``geglu(x) = a * gelu(b)`` where the projection packs ``[a | b]`` along
    the feature axis (GEGLU ``modules.py:271-284``).
  * ``snake_beta`` DiT-FF variant (``modules.py:293-296``):
        x + beta * sin(alpha x)^2
  * ``snake_beta_vae`` BigVGAN/SnakeBeta variant used by the Oobleck VAE
    (``blocks.py:317-319``):  x + (1/(beta+1e-9)) * sin(alpha x)^2 with
    log-scale trainable per-channel alpha/beta (exp applied to params).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def gelu(x):
    """Exact (erf-based) GELU, matching torch's default."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    """Tanh-approximate GELU (torch approximate='tanh', HF 'gelu_new').

    Written out explicitly (rather than jax.nn.gelu(approximate=True)) to
    match torch's op order bit-for-bit at float32.
    """
    x3 = x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(SQRT_2_OVER_PI * (x + 0.044715 * x3)))


def geglu(x_packed):
    """GEGLU over a packed projection: ``[hidden | gate]`` on the last axis."""
    a, b = jnp.split(x_packed, 2, axis=-1)
    return a * gelu(b)


def approximate_gelu(x):
    """x * sigmoid(1.702 x) (reference ApproximateGELU, modules.py:287-295)."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x):
    return jax.nn.silu(x)


def snake_beta(x, alpha, beta):
    """DiT feed-forward snake: ``x + beta * sin(alpha x)^2``."""
    return x + beta * jnp.square(jnp.sin(x * alpha))


def snake_beta_vae(x, alpha, beta):
    """VAE SnakeBeta: ``x + (1/(beta+1e-9)) * sin(alpha x)^2``.

    ``alpha``/``beta`` are already exp()'d linear-scale values broadcastable
    to ``x`` (per-channel on the last axis in our channel-last layout).
    """
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


ACT_FNS = {
    "gelu": gelu,
    "gelu-approximate": gelu_tanh,
    "geglu-approximate": approximate_gelu,
    "silu": silu,
}
