"""Ring attention: sequence-parallel attention over an ``sp`` mesh axis.

The reference has no sequence parallelism (its only strategy is DDP,
audiotools/ml/accelerator.py:41-48); long-form audio there is handled by
chained outpainting in host code.  On TPU the natural long-context design is
to shard the *latent sequence* across chips and ride the ICI ring:

  * Q, K, V live sharded over ``sp`` on their length axis — each device
    holds an (B, H, L/sp, D) block and never materializes the full sequence;
  * each device computes online-softmax partial attention of its local Q
    block against the K/V block it currently holds, then rotates K/V (and
    the key-validity mask) one hop around the ring with ``lax.ppermute``;
  * after ``sp`` hops every Q block has seen every K/V block and the
    normalized output is exact — identical math to flash attention, with
    the block loop distributed over devices instead of over VMEM tiles.

Communication is 2 x (L/sp) x D x H x B elements per hop on the ICI ring
(neighbour exchange only — no all-gather), so attention memory AND compute
scale 1/sp per chip while the per-hop matmul stays MXU-shaped.

This is exact (not approximate) attention: equality vs the dense einsum
path is tested on an 8-virtual-device mesh in tests/test_ring_attention.py.
"""

from __future__ import annotations

import contextlib
import threading
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_body(q, k, v, kmask, *, scale: float, axis: str, steps: int):
    """Per-device body under shard_map.

    q:     (B, H, Lq_loc, D)  local query block (stays put)
    k, v:  (B, H, Lk_loc, D)  local key/value block (rotates)
    kmask: (B, Lk_loc) bool   key-validity block (rotates with k/v)
    """
    sp = steps
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    neg = jnp.float32(jnp.finfo(jnp.float32).max)

    B, H, Lq, D = q.shape
    q32 = q.astype(jnp.float32)

    def accum(k_blk, v_blk, m_blk, m, l, acc):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32) * jnp.float32(scale)
        s = jnp.where(m_blk[:, None, None, :], s, -neg)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + p.sum(axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    # local block first, then sp-1 rotate-then-accumulate hops — exactly
    # sp-1 ppermutes total (a rotate-last loop would pay one extra dead
    # ICI hop per call: XLA does not eliminate collectives inside scan)
    m0 = jnp.full((B, H, Lq, 1), -neg, jnp.float32)
    l0 = jnp.zeros((B, H, Lq, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)
    m, l, acc = accum(k, v, kmask, m0, l0, acc0)

    def step(carry, _):
        k_blk, v_blk, m_blk, m, l, acc = carry
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        m_blk = jax.lax.ppermute(m_blk, axis, perm)
        m, l, acc = accum(k_blk, v_blk, m_blk, m, l, acc)
        return (k_blk, v_blk, m_blk, m, l, acc), None

    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, kmask, m, l, acc), None, length=sp - 1)
    out = acc / jnp.maximum(l, jnp.float32(1e-30))
    return out.astype(v.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    axis: str = "sp",
    batch_axes: Optional[Sequence[str]] = None,
) -> jnp.ndarray:
    """Exact attention over (B, H, L, D) with L sharded on mesh axis ``axis``.

    ``q``/``k``/``v`` are GLOBAL arrays (callable under an enclosing jit);
    shard_map splits them (batch over ``batch_axes`` if given, length over
    ``axis``) and runs the online-softmax ring.  ``key_mask`` is the usual
    (B, Lk) True=attend mask; it rotates with its K/V block.

    L must be divisible by mesh.shape[axis] (pad upstream — the model pads
    latent frames to the patch grid already).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if key_mask is None:
        key_mask = jnp.ones((k.shape[0], k.shape[2]), bool)
    sp = mesh.shape[axis]
    assert q.shape[2] % sp == 0 and k.shape[2] % sp == 0, (
        f"sequence {q.shape[2]}/{k.shape[2]} not divisible by sp={sp}")

    b = tuple(batch_axes) if batch_axes else None
    qkv_spec = P(b, None, axis, None)
    mask_spec = P(b, axis)

    body = partial(_ring_body, scale=float(scale), axis=axis, steps=sp)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return f(q, k, v, key_mask)


# ---------------------------------------------------------------------------
# Ambient ring context: lets flax modules opt into sequence parallelism
# without threading a Mesh through every __call__ signature.
# ---------------------------------------------------------------------------

_state = threading.local()


@contextlib.contextmanager
def ring_context(mesh: Mesh, axis: str = "sp",
                 batch_axes: Optional[Sequence[str]] = None):
    """Trace-time context: inside it, ``Attention(attention_impl='ring')``
    (and impl='auto' when the mesh has sp>1) routes self-attention through
    :func:`ring_attention` on this mesh.  Enter it around the jit *call*
    (tracing happens inside)."""
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, axis, tuple(batch_axes) if batch_axes else None)
    try:
        yield
    finally:
        _state.ctx = prev


def current_ring_context() -> Optional[Tuple[Mesh, str, Optional[Tuple[str, ...]]]]:
    return getattr(_state, "ctx", None)
