"""Fused-kernel Oobleck VAE decode: same params, fewer HBM round trips.

A functional twin of ``OobleckDecoder.__call__`` (oobleck.py) that runs
every ResidualUnit through the fused Pallas kernel
(``ops/pallas/resunit.py`` — snake->dilated-conv7->snake->conv1x1->
residual in ONE pass) and the remaining stem/up/head convs through the
same lax ops the flax modules use.  It consumes the UNCHANGED flax
param tree, so checkpoints, converters and goldens are untouched; the
facade routes decode() through this path on TPU (EZAUDIO_VAE_FUSED=0
reverts to the flax module path).

Motivation (probe13): the decoder tail at C=128 is VPU/HBM-bound — the
XLA path leaves each snake as a separate ~4-7 ms pass at 10 s batch-4
geometry; fusing the unit cuts decode time materially (A/B in
BASELINE.md).  Reference behavior:
``src/modules/stable_vae/models/autoencoders.py:149-190``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from ezaudio_tpu.ops.activations import snake_beta_vae
from ezaudio_tpu.ops.pallas.resunit import fused_residual_unit


def _conv(x, p, *, stride=1, padding=0, dilation=1, dtype=None, bias=True):
    y = lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (stride,),
        [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    if bias:
        y = y + p["bias"].astype(dtype)
    return y


def _conv_t(x, p, *, stride, padding, dtype):
    k = p["kernel"].shape[0]
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1,),
        [(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["bias"].astype(dtype)


def _snake(x, p, dtype):
    a = jnp.exp(p["alpha"]).astype(dtype)
    b = jnp.exp(p["beta"]).astype(dtype)
    return snake_beta_vae(x, a, b)


def _resunit(x, p, dilation, dtype, interpret):
    return fused_residual_unit(
        x,
        p["conv1"]["kernel"].astype(dtype), p["conv1"]["bias"].astype(dtype),
        p["conv2"]["kernel"][0].astype(dtype), p["conv2"]["bias"].astype(dtype),
        jnp.exp(p["act1"]["alpha"]), jnp.exp(p["act1"]["beta"]),
        jnp.exp(p["act2"]["alpha"]), jnp.exp(p["act2"]["beta"]),
        dilation, interpret)


def decode_fused(dec_params, z, *, channels: int, c_mults, strides,
                 final_tanh: bool, dtype=jnp.float32, interpret=False):
    """``OobleckDecoder`` forward on its flax param subtree.

    ``dec_params``: ``variables["params"]["decoder"]`` of an ``AudioVAE``
    built with ``use_weight_norm=False`` (the inference parameterization —
    weight norm is folded at checkpoint conversion).
    """
    x = _conv(z, dec_params["stem"], padding=3, dtype=dtype)
    n = len(strides)
    for j, i in enumerate(range(n, 0, -1)):
        bp = dec_params[f"block{j}"]
        s = strides[i - 1]
        x = _snake(x, bp["act"], dtype)
        x = _conv_t(x, bp["up"], stride=s, padding=math.ceil(s / 2),
                    dtype=dtype)
        for r, d in enumerate((1, 3, 9)):
            x = _resunit(x, bp[f"res{r}"], d, dtype, interpret)
    x = _snake(x, dec_params["act"], dtype)
    x = _conv(x, dec_params["head"], padding=3, dtype=dtype, bias=False)
    if final_tanh:
        x = jnp.tanh(x)
    return x


def decode_fused_for(model, params, z, interpret=False):
    """Convenience: route an ``AudioVAE``'s decode through the fused path."""
    return decode_fused(
        params["decoder"], z, channels=model.channels,
        c_mults=model.c_mults, strides=model.strides,
        final_tanh=model.final_tanh, dtype=model.dtype, interpret=interpret)


def encode_fused(enc_params, audio, *, channels: int, c_mults, strides,
                 dtype=jnp.float32, interpret=False):
    """``OobleckEncoder`` forward on its flax param subtree (same kernel
    win on the encode side — the first block's ResidualUnits run at the
    C=128 / full-sample-rate geometry, the mirror of the decoder tail).
    Used by training's per-batch VAE encode and the editing/ControlNet
    request paths.  Reference: ``autoencoders.py:115-146``."""
    x = _conv(audio, enc_params["stem"], padding=3, dtype=dtype)
    for i, s in enumerate(strides):
        bp = enc_params[f"block{i}"]
        for r, d in enumerate((1, 3, 9)):
            x = _resunit(x, bp[f"res{r}"], d, dtype, interpret)
        x = _snake(x, bp["act"], dtype)
        x = _conv(x, bp["down"], stride=s, padding=math.ceil(s / 2),
                  dtype=dtype)
    x = _snake(x, enc_params["act"], dtype)
    return _conv(x, enc_params["head"], padding=1, dtype=dtype)


def encode_fused_for(model, params, audio, interpret=False):
    """Convenience: route an ``AudioVAE``'s encode through the fused path."""
    return encode_fused(
        params["encoder"], audio, channels=model.channels,
        c_mults=model.c_mults, strides=model.strides,
        dtype=model.dtype, interpret=interpret)
