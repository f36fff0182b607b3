"""Alternative CFG / conditioning wrappers.

Parity with the reference's non-MaskDiT conditioner variants
(src/models/conditioners.py:10-120), which exist in the codebase as
architectural alternatives (the published models use MaskDiT):

  * ``EmbeddingCFG`` — learned null-embedding dropout for CFG (:10-42);
  * ``DiscreteCFG``  — token-id replacement dropout (:45-62);
  * ``CFGModel``     — backbone + EmbeddingCFG on the context (:65-80);
  * ``ConcatModel``  — channel-concat conditioning with a strided conv
    pyramid downsampling the condition to the latent rate (:83-120).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.ops.convs import Conv1d


class EmbeddingCFG(nn.Module):
    """Learned null embedding swapped in with probability ``cfg_prob``."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, condition, condition_mask=None, cfg_prob: float = 0.0):
        null = self.param(
            "cfg_embedding",
            lambda k, s, d=jnp.float32: jax.random.normal(k, s, d) / math.sqrt(self.in_channels),
            (self.in_channels,), jnp.float32)
        # reference semantics (conditioners.py:35-42): dropout applies
        # whenever cfg_prob > 0 — the CALLER zeroes cfg_prob at inference.
        # (A former train= gate here defaulted to no-op, silently training
        # without CFG dropout for reference-shaped call sites.)
        if cfg_prob <= 0:
            return condition, condition_mask
        B = condition.shape[0]
        drop = jax.random.uniform(self.make_rng("cfg"), (B,)) < cfg_prob
        uncond = jnp.broadcast_to(null.astype(condition.dtype)[None, None, :],
                                  condition.shape)
        condition = jnp.where(drop[:, None, None], uncond, condition)
        if condition_mask is not None:
            # dropped rows attend only to position 0 (conditioners.py:30-32)
            dropped_mask = jnp.zeros_like(condition_mask).at[:, 0].set(True)
            condition_mask = jnp.where(drop[:, None], dropped_mask, condition_mask)
        return condition, condition_mask


class DiscreteCFG(nn.Module):
    """Token-id CFG dropout: dropped rows become [replace_id, 0, 0, ...]."""

    replace_id: int = 2

    @nn.compact
    def __call__(self, context, context_mask=None, cfg_prob: float = 0.0):
        # reference semantics: gate on cfg_prob alone (see EmbeddingCFG)
        if cfg_prob <= 0:
            return context, context_mask
        B = context.shape[0]
        drop = jax.random.uniform(self.make_rng("cfg"), (B,)) < cfg_prob
        dropped = jnp.zeros_like(context).at[:, 0].set(self.replace_id)
        context = jnp.where(drop[:, None], dropped, context)
        if context_mask is not None:
            dm = jnp.zeros_like(context_mask).at[:, 0].set(True)
            context_mask = jnp.where(drop[:, None], dm, context_mask)
        return context, context_mask


class CFGModel(nn.Module):
    """Backbone with EmbeddingCFG-dropped context."""

    context_dim: int
    backbone: nn.Module

    @nn.compact
    def __call__(self, x, timesteps, context, x_mask=None, context_mask=None,
                 cfg_prob: float = 0.0):
        context, context_mask = EmbeddingCFG(
            self.context_dim, name="context_cfg")(
            context, context_mask, cfg_prob)
        return self.backbone(x=x, timesteps=timesteps, context=context,
                             x_mask=x_mask, context_mask=context_mask)


class ConcatModel(nn.Module):
    """Channel-concat conditioning: a strided conv pyramid brings the
    condition to the latent frame rate, EmbeddingCFG drops it, and the
    result is concatenated on channels before the backbone."""

    backbone: nn.Module
    in_dim: int
    strides: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, x_mask=None,
                 cfg_prob: float = 0.0):
        dim = self.in_dim
        for i, s in enumerate(self.strides):
            context = Conv1d(dim, dim * 2, kernel_size=2 * s, stride=s,
                             padding=math.ceil(s / 2), dtype=self.dtype,
                             name=f"down{i}")(context)
            dim *= 2
        context, _ = EmbeddingCFG(dim, name="context_cfg")(
            context, None, cfg_prob)
        assert context.shape[1] == x.shape[1], (context.shape, x.shape)
        x = jnp.concatenate([context, x], axis=-1)
        return self.backbone(x=x, timesteps=timesteps, context=None,
                             x_mask=x_mask, context_mask=None)
