"""FiLM modulation and the transformer feed-forward block.

Parity targets: ``film_modulate`` (reference modules.py:15-16) and
``FeedForward`` (modules.py:328-374) with the activation zoo
(GELU/GEGLU/ApproximateGELU/Snake/GESnake).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.ops import activations as act
from ezaudio_tpu.ops.convs import xavier_linear


def film_modulate(x, shift, scale):
    """``x * (1 + scale) + shift`` with (B, 1, D) broadcast conditioning."""
    return x * (1 + scale) + shift


class FeedForward(nn.Module):
    """Transformer MLP with selectable activation.

    ``geglu`` (the EzAudio setting, ``act_layer: geglu`` in all configs)
    projects to ``2 * inner`` and gates: ``a * gelu(b)``.  The packed
    projection keeps one big MXU matmul; XLA fuses the split+gelu+mul
    epilogue.  snake/gesnake carry trainable per-channel alpha/beta
    initialized to ones (modules.py:297-325).
    """

    dim: int
    mult: float = 4.0
    activation_fn: str = "geglu"
    dim_out: int | None = None
    inner_dim: int | None = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.inner_dim or int(self.dim * self.mult)
        dim_out = self.dim_out or self.dim
        fn = self.activation_fn

        if fn in ("geglu", "gesnake"):
            h = xavier_linear(self.dim, inner * 2, dtype=self.dtype, name="proj_in")(x)
        else:
            h = xavier_linear(self.dim, inner, dtype=self.dtype, name="proj_in")(x)

        if fn == "gelu":
            h = act.gelu(h)
        elif fn == "gelu-approximate":
            h = act.gelu_tanh(h)
        elif fn == "geglu":
            h = act.geglu(h)
        elif fn == "geglu-approximate":
            h = act.approximate_gelu(h)
        elif fn in ("snake", "gesnake"):
            alpha = self.param("alpha", nn.initializers.ones, (1, 1, inner), jnp.float32)
            beta = self.param("beta", nn.initializers.ones, (1, 1, inner), jnp.float32)
            if fn == "snake":
                h = act.snake_beta(h, alpha.astype(h.dtype), beta.astype(h.dtype))
            else:
                a, gate = jnp.split(h, 2, axis=-1)
                h = a * act.snake_beta(gate, alpha.astype(h.dtype), beta.astype(h.dtype))
        else:
            raise NotImplementedError(fn)

        return xavier_linear(inner, dim_out, dtype=self.dtype, name="proj_out")(h)
