"""Scaled dot-product attention for TPU.

The reference relies on ``F.scaled_dot_product_attention`` with a boolean
mask (``src/models/utils/attention.py:105-120``).  Here attention is a pure
function over (B, H, L, D) tensors; the einsum formulation lets XLA fuse the
softmax chain and tile the two matmuls onto the MXU.  For the EzAudio
geometry (L=500–600, D=64–72, H=16) the whole score matrix fits comfortably
in VMEM per (batch, head) tile, so a flash-style streaming kernel is not
required for correctness — a Pallas fused kernel is provided separately in
``ezaudio_tpu.ops.pallas`` as an optimization path.

Mask semantics match the reference: ``mask`` is boolean with True = attend;
masked logits are filled with the most negative finite value of the softmax
dtype before softmax (attention.py:20-27).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over (B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D).

    ``mask`` broadcasts against (B, H, Lq, Lk); True = attend.
    Softmax runs in float32 regardless of input dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        neg = jnp.finfo(logits.dtype).max
        logits = jnp.where(mask, logits, -neg)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def make_attention_mask(
    q_len: int,
    k_mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Build a (B, 1, Lq, Lk) boolean mask from a (B, Lk) key-validity mask.

    Mirrors reference ``create_mask`` (attention.py:30-37) with q_mask=None:
    every query attends, keys are gated by ``k_mask``.
    """
    if k_mask is None:
        return None
    return k_mask[:, None, None, :]
