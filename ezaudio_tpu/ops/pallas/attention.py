"""Fused attention kernel (Pallas, TPU).

The reference's kernel surface is ``F.scaled_dot_product_attention``
(attention.py:105-120).  For the EzAudio geometry — self-attention over
500 latent tokens and 500x100 cross-attention, head_dim 64 (L) / 72 (XL) —
the ENTIRE per-(batch, head) problem fits in VMEM:

    q (512, 128) + k (512, 128) + v (512, 128) + scores (512, 512)
    = ~1.8 MB float32  <<  16 MB VMEM

so the right TPU kernel is not a streaming flash loop but a single fused
block: one kernel computes QK^T on the MXU, does the f32 row softmax on
the VPU, and multiplies by V — with no HBM round trip for the score
matrix.  The wrapper pads (Lq, Lk, D) to lane/sublane multiples and folds
padding into the additive key bias.

Falls back transparently to the einsum path on CPU (tests run the kernel
in interpreter mode for parity).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (Lq, D)
    k = k_ref[0, 0]  # (Lk, D)
    v = v_ref[0, 0]  # (Lk, D)
    bias = bias_ref[0]  # (1, Lk) additive f32 (0 or -inf-ish)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores * scale + bias  # (Lq, Lk), bias broadcasts over rows

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s

    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_diff(q, k, v, key_mask, scale, interpret):
    return _fused_attention_impl(q, k, v, key_mask, scale, interpret)


def _fused_attention_fwd(q, k, v, key_mask, scale, interpret):
    return (_fused_attention_impl(q, k, v, key_mask, scale, interpret),
            (q, k, v, key_mask))


def _fused_attention_bwd(scale, interpret, residuals, g):
    """Backward via the einsum formulation (recompute): the standard
    flash-attention economics — one extra forward-sized recompute instead of
    materializing the score matrix in HBM on the forward pass."""
    from ezaudio_tpu.ops.attention import dot_product_attention

    q, k, v, key_mask = residuals
    mask4 = None if key_mask is None else key_mask[:, None, None, :]
    _, vjp = jax.vjp(
        lambda q_, k_, v_: dot_product_attention(q_, k_, v_, mask=mask4,
                                                 scale=scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused_attention_diff.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over (B, H, Lq, D) with optional (B, Lk) key mask.

    Differentiable: Pallas fused forward, einsum-recompute backward.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fused_attention_diff(q, k, v, key_mask, float(scale), interpret)


def _fused_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward kernel wrapper: grid = one program per (batch, head);
    everything resident in VMEM."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D**-0.5

    # pad to TPU tiles: sublane 8 (f32), lane 128
    Lq_p, Lk_p, D_p = _round_up(Lq, 8), _round_up(Lk, 128), _round_up(D, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Lq_p - Lq), (0, D_p - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)))

    neg = jnp.float32(-1e30)
    if key_mask is None:
        bias = jnp.zeros((B, Lk_p), jnp.float32)
        bias = bias.at[:, Lk:].set(neg)
    else:
        bias = jnp.where(key_mask.astype(bool), 0.0, neg).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, Lk_p - Lk)), constant_values=neg)

    # grid (B, H): batch index reaches the bias row without any index
    # arithmetic (division in index maps is unsupported by Mosaic).
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_p, D_p), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, H),
            in_specs=[
                pl.BlockSpec((1, 1, Lq_p, D_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk_p, D_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk_p, D_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk_p), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, Lq_p, D_p), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Lq_p * Lk_p * D_p,
            bytes_accessed=4 * (Lq_p * D_p + 2 * Lk_p * D_p + Lq_p * D_p),
            transcendentals=Lq_p * Lk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bias[:, None, :])

    return out[:, :, :Lq, :D]
