"""Rotary position embeddings (GPT-NeoX half-split convention).

Parity target: reference ``src/models/utils/rotary.py`` — inverse frequencies
``1/10000^(2i/d)``, cos/sin tables built as ``cat([freqs, freqs], -1)``,
``rotate_half`` splits the head dim into two contiguous halves, and rotation
is applied in float32 then cast back to the input dtype.

TPU design: tables are precomputed at trace time for the (static) sequence
length and broadcast into the attention kernel — no caching machinery is
needed because XLA constant-folds them into the compiled program.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_tables(seq_len: int, head_dim: int, base: float = 10000.0):
    """Return (cos, sin) tables of shape (seq_len, head_dim), float32."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (L, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (L, D)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """Apply rotary embedding to ``x`` of shape (..., L, D).

    ``cos``/``sin`` are (L, D) float32 tables; computation runs in float32
    and the result is cast back to ``x.dtype`` (rotary.py:72-91).
    """
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def apply_rope_skip_prefix(x, cos, sin, extras: int):
    """Rotate only positions ``extras:`` (reference rope modes x_only/dual,
    attention.py:90-99); prefix positions pass through unrotated."""
    if extras == 0:
        return apply_rope(x, cos, sin)
    prefix, rest = x[..., :extras, :], x[..., extras:, :]
    rest = apply_rope(rest, cos[: rest.shape[-2]], sin[: rest.shape[-2]])
    return jnp.concatenate([prefix, rest], axis=-2)
