"""1D convolutions with exact PyTorch semantics, channel-last layout.

The reference uses ``nn.Conv1d`` / ``nn.ConvTranspose1d`` (optionally
weight-normalized, descript-style ``WNConv1d``/``WNConvTranspose1d`` in
``src/modules/stable_vae/models/nn/layers.py``).  We reimplement both on
``lax.conv_general_dilated`` with:

  * layout (B, T, C) — channels ride the TPU lane dimension;
  * kernels stored as (k, in, out) (HIO);  the torch->jax converter maps
    torch Conv1d weights (out, in, k) via transpose, and ConvTranspose1d
    weights (in, out, k) via transpose + time-flip (see
    ``ezaudio_tpu/convert/torch_to_jax.py``);
  * optional live weight-norm parameterization (params ``v`` and ``g``;
    kernel = g * v / ||v||), matching ``torch.nn.utils.weight_norm`` with
    its default ``dim=0``: per-OUT-channel for Conv1d, per-IN-channel for
    ConvTranspose1d.

Output length parity: Conv1d ``floor((T + 2p - d(k-1) - 1)/s) + 1``;
ConvTranspose1d ``(T-1)s - 2p + k``.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _torch_conv_kernel_init(fan_in: int):
    """torch default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    zero_init: bool = False  # zero kernel+bias (ControlNet out convs)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = (self.in_channels // self.groups) * k
        kshape = (k, self.in_channels // self.groups, self.out_channels)
        if self.weight_norm:
            v = self.param("v", _torch_conv_kernel_init(fan_in), kshape, jnp.float32)
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, self.out_channels), axis=0
                ),
                (self.out_channels,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True) + 0.0)
            kernel = (g / jnp.maximum(norm, 1e-12)) * v
        else:
            kinit = nn.initializers.zeros if self.zero_init else _torch_conv_kernel_init(fan_in)
            kernel = self.param("kernel", kinit, kshape, jnp.float32)

        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            binit = nn.initializers.zeros if self.zero_init else _torch_conv_kernel_init(fan_in)
            b = self.param("bias", binit, (self.out_channels,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed conv matching ``torch.nn.ConvTranspose1d``.

    Implemented as an input-dilated correlation: dilate the input by
    ``stride``, pad both sides with ``k - 1 - padding``, and correlate with
    the stored kernel.  The stored kernel layout is (k, in, out) already in
    correlation orientation; converting a torch weight W(in, out, k) requires
    ``W.transpose(2, 0, 1)[::-1]`` (time-flip), handled by the converter.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # torch fan_in for ConvTranspose1d weight (in, out, k) is out*k.
        fan_in = self.out_channels * k
        kshape = (k, self.in_channels, self.out_channels)
        if self.weight_norm:
            v = self.param("v", _torch_conv_kernel_init(fan_in), kshape, jnp.float32)
            # weight_norm dim=0 on torch layout (in, out, k): per-IN-channel
            # norm over (out, k) -> axes (0, 2) of our (k, in, out) layout.
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))),
                (self.in_channels,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
            kernel = (g[None, :, None] / jnp.maximum(norm, 1e-12)) * v
        else:
            kernel = self.param("kernel", _torch_conv_kernel_init(fan_in), kshape, jnp.float32)

        s = self.stride
        if (s > 1 and k == 2 * s and self.padding <= s
                and os.environ.get("EZAUDIO_CONVT_IMPL", "lax") == "polyphase"):
            # Polyphase dense form — MEASURED SLOWER than the lax
            # lowering on real TPU (probe13: full Oobleck decode 97.8 ms
            # polyphase vs 76.0 ms lax at batch 4 bf16), i.e. XLA:TPU
            # already lowers lhs_dilation efficiently; kept env-selectable
            # (EZAUDIO_CONVT_IMPL=polyphase) as the documented refutation.
            # The hypothesis was: at stride s the MXU multiplies (s-1)/s
            # zeros.  For the k=2s geometry every output sample has
            # exactly two taps; with zero torch-padding,
            #   y[i*s + phi] = x[i-1] @ Wt[phi+s] + x[i] @ Wt[phi]
            # (phi in [0,s), i in [0,T], out-of-range x = 0; derived
            # from torch's m = t*s + j - p), i.e. ONE dense matmul
            # (B*(T+1), 2*in) @ (2*in, s*out) with zero wasted lanes.
            # torch's ``padding`` merely crops p samples off each side.
            # Our stored kernel is the time-FLIPPED torch weight
            # (correlation orientation), so Wt[j] = kernel[k-1-j].
            kd = kernel.astype(self.dtype)
            wbig = jnp.concatenate(
                [jnp.flip(kd[:s], 0), jnp.flip(kd[s:], 0)], axis=1)  # (s, 2in, out)
            xd = x.astype(self.dtype)
            bsz, t_in, _ = xd.shape
            xp = jnp.pad(xd, ((0, 0), (1, 1), (0, 0)))
            z = jnp.concatenate([xp[:, :-1], xp[:, 1:]], axis=-1)
            out = jnp.einsum("btc,scd->btsd", z, wbig)
            y = out.reshape(bsz, (t_in + 1) * s, self.out_channels)
            y = y[:, self.padding: (t_in + 1) * s - self.padding]
        else:
            pad = k - 1 - self.padding
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            b = self.param("bias", _torch_conv_kernel_init(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class Linear(nn.Module):
    """Dense layer with torch's default init (kaiming-uniform a=sqrt(5))."""

    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: Optional[nn.initializers.Initializer] = None
    bias_init: Optional[nn.initializers.Initializer] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kinit = self.kernel_init or _torch_conv_kernel_init(self.in_features)
        kernel = self.param("kernel", kinit, (self.in_features, self.out_features), jnp.float32)
        from ezaudio_tpu.ops.quant import (
            MIN_QUANT_ELEMENTS, current_quant_mode, int8_dot)

        if (current_quant_mode() == "int8"
                and self.in_features * self.out_features >= MIN_QUANT_ELEMENTS):
            # W8A8 dynamic quantization (ops/quant.py): int8 MXU matmul at
            # 2x the bf16 rate; weight quantization hoists out of the
            # sampling scan.  Inference-only (round has zero gradient).
            y = int8_dot(x, kernel).astype(self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        if self.use_bias:
            binit = self.bias_init or _torch_conv_kernel_init(self.in_features)
            b = self.param("bias", binit, (self.out_features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def xavier_linear(in_features, out_features, dtype=jnp.float32, name=None, use_bias=True):
    """Linear with xavier-uniform kernel / zero bias — the reference DiT's
    basic init (udit.py ``_basic_init``)."""
    return Linear(
        in_features=in_features,
        out_features=out_features,
        use_bias=use_bias,
        kernel_init=nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def zero_linear(in_features, out_features, dtype=jnp.float32, name=None, use_bias=True):
    """Zero-initialized Linear (AdaLN heads, ControlNet zero blocks)."""
    return Linear(
        in_features=in_features,
        out_features=out_features,
        use_bias=use_bias,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class Conv2d(nn.Module):
    """torch-parity 2D conv, layout (B, H, W, C), kernel (kh, kw, in, out).

    Needed by the DAC discriminators (MPD/MRD).  Weight norm follows torch
    dim=0 (per-out-channel over (in, kh, kw)).
    """

    in_channels: int
    out_channels: int
    kernel_size: tuple
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        kshape = (kh, kw, self.in_channels, self.out_channels)
        if self.weight_norm:
            v = self.param("v", _torch_conv_kernel_init(fan_in), kshape, jnp.float32)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))),
                (self.out_channels,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
            kernel = (g / jnp.maximum(norm, 1e-12)) * v
        else:
            kernel = self.param("kernel", _torch_conv_kernel_init(fan_in), kshape, jnp.float32)
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", _torch_conv_kernel_init(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y
