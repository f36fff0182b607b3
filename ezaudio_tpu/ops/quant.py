"""Dynamic int8 quantization for inference matmuls.

The TPU v5e MXU executes int8 x int8 -> int32 at twice the bf16 rate
(~394 int8 TOPS vs ~197 bf16 TFLOPS).  The DiT sampling step is
compute-bound at ~50% MFU in bf16 (BASELINE.md round-2 probe6: the non-MXU
time overlaps), so quantizing the big linear layers is the remaining
throughput lever that neither fusion nor kernels can reach.

Scheme (W8A8, symmetric, zero-point-free — MXU int8 paths need symmetric):
  * weights: per-output-channel scales.  Quantization is loop-invariant in
    the sampling scan, so XLA hoists it — weights are quantized once per
    call, not once per diffusion step;
  * activations: per-token (row) scales computed dynamically in-graph (no
    calibration pass, no held-out data needed);
  * accumulation in int32, rescale epilogue in f32 (fused by XLA).

This is INFERENCE-ONLY: ``round`` has zero gradient.  Training stays bf16.

Enable via ``quant_context("int8")`` around the jit call (the EzAudio API
exposes ``quant='int8'``), or ``EZAUDIO_QUANT=int8`` for the env knob.
No reference analog (the torch repo runs fp16 AMP only — train.py:33).
"""

from __future__ import annotations

import contextlib
import os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Layers smaller than this (in_features * out_features) stay in bf16/f32:
# the quantize/rescale overhead outweighs the MXU win on tiny matmuls
# (timestep MLPs, AdaLN LoRA ranks, tiny test configs).
MIN_QUANT_ELEMENTS = 256 * 256


def quantize_symmetric(x: jnp.ndarray, axis: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization along ``axis``: returns (q, scale) with
    ``x ~= q * scale``; q int8 in [-127, 127], scale keeps ``axis`` as 1."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``x @ w`` with dynamic W8A8 int8 quantization.

    x: (..., K) activations — quantized per row (last axis);
    w: (K, N) weights — quantized per output channel (axis 0).
    Returns f32 (..., N).
    """
    xq, xs = quantize_symmetric(x.astype(jnp.float32), -1)
    wq, ws = quantize_symmetric(w.astype(jnp.float32), 0)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * xs * ws


# ---------------------------------------------------------------------------
# Ambient quant mode (trace-time, like ring_context): lets the sampler opt
# whole models into int8 without threading a flag through every module.
# ---------------------------------------------------------------------------

_state = threading.local()


@contextlib.contextmanager
def quant_context(mode: Optional[str]):
    """``with quant_context('int8'):`` — Linear layers above
    MIN_QUANT_ELEMENTS run their matmul through :func:`int8_dot` while
    tracing inside.  ``mode=None`` is a no-op (convenience for call sites
    with a quant argument; the ``EZAUDIO_QUANT`` env fallback still
    applies).  ``mode='off'`` force-disables quantization INCLUDING the
    env fallback — training steps trace inside this so a lingering
    ``EZAUDIO_QUANT=int8`` cannot silently zero the weight gradients
    (``round`` has no gradient)."""
    assert mode in (None, "int8", "off"), mode
    prev = getattr(_state, "mode", None)
    _state.mode = mode
    try:
        yield
    finally:
        _state.mode = prev


def current_quant_mode() -> Optional[str]:
    mode = getattr(_state, "mode", None)
    if mode == "off":
        return None
    if mode is None:
        mode = os.environ.get("EZAUDIO_QUANT") or None
    return mode
