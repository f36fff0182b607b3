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
    softmax_dtype=jnp.float32,
) -> jnp.ndarray:
    """Attention over (B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D).

    ``mask`` broadcasts against (B, H, Lq, Lk); True = attend.
    ``softmax_dtype``: the logits/softmax compute+storage dtype — float32
    by default; bfloat16 halves the score-matrix HBM traffic (the dominant
    per-sample batch-scaling term at L=500, BASELINE.md probe4/probe6) at
    reduced softmax precision (quality-check before serving with it).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=softmax_dtype
    ) * jnp.asarray(scale, softmax_dtype)
    if mask is not None:
        neg = jnp.finfo(logits.dtype).max
        logits = jnp.where(mask, logits, -neg)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def chunked_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    q_chunk: int = 128,
    softmax_dtype=jnp.float32,
) -> jnp.ndarray:
    """Query-chunked einsum attention: a ``lax.scan`` over Lq tiles so only
    a (B, H, q_chunk, Lk) score tile is live at a time instead of the full
    (B, H, Lq, Lk) materialization — the no-new-kernel alternative to flash
    attention for trimming attention-score memory at large batch
    (VERDICT r2 item 5; the Pallas kernels lose at this geometry because
    head_dim 72 pads to 128 lanes, BASELINE.md probe5).

    ``mask`` must be query-independent (shape (..., 1, Lk)) — the EzAudio
    usage (key-validity masks only).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, L, D = q.shape
    if mask is not None:
        assert mask.ndim == 4 and mask.shape[2] == 1, (
            "chunked attention needs a query-independent mask", mask.shape)
    pad = (-L) % q_chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else q
    nc = (L + pad) // q_chunk
    q_tiles = qp.reshape(B, H, nc, q_chunk, D).transpose(2, 0, 1, 3, 4)

    def body(_, q_tile):
        o = dot_product_attention(q_tile, k, v, mask=mask, scale=scale,
                                  softmax_dtype=softmax_dtype)
        return None, o

    _, outs = jax.lax.scan(body, None, q_tiles)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, L + pad, D)
    return out[:, :, :L, :] if pad else out


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


def flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention via jax's production TPU Pallas kernel
    (jax.experimental.pallas.ops.tpu.flash_attention): streams K/V blocks
    through VMEM without materializing the (Lq, Lk) logits — the einsum
    path writes ~B*H*L^2 f32 to HBM per layer, which is the dominant
    batch-scaling term at L=500 (BASELINE.md round-2 probe).

    The kernel needs sequence lengths in multiples of 128 lanes: inputs
    are zero-padded (500 -> 512) and padded keys are masked via segment
    ids.  Falls back to the einsum path off-TPU (kernel is TPU-only).
    """
    if jax.default_backend() not in ("tpu", "axon"):
        mask = None if key_mask is None else key_mask[:, None, None, :]
        return dot_product_attention(q, k, v, mask=mask, scale=scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    pad_q = (-Lq) % 128
    pad_k = (-Lk) % 128

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))

    seg = None
    if key_mask is not None or pad_q or pad_k:
        q_ids = jnp.ones((B, Lq + pad_q), jnp.int32)
        if pad_q:
            q_ids = q_ids.at[:, Lq:].set(0)
        if key_mask is not None:
            k_ids = jnp.pad(key_mask.astype(jnp.int32),
                            ((0, 0), (0, pad_k)))
        else:
            k_ids = jnp.ones((B, Lk + pad_k), jnp.int32)
            if pad_k:
                k_ids = k_ids.at[:, Lk:].set(0)
        seg = fa.SegmentIds(q=q_ids, kv=k_ids)

    out = fa.flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                             sm_scale=float(scale))
    return out[:, :, :Lq, :]
