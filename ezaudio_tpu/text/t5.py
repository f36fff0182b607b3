"""Native flax T5 encoder (FLAN-T5 class) — the text conditioning tower.

The reference loads ``transformers`` ``T5EncoderModel``
(``google/flan-t5-large``/``-xl``; api/ezaudio.py:78-80) and uses
``last_hidden_state`` as cross-attention context.  This is a from-scratch
flax implementation of the same architecture:

  * T5LayerNorm: RMS (no mean subtraction, no bias), computed in float32;
  * relative position bias: 32 bidirectional buckets, max_distance 128,
    computed once in layer 0 and shared across layers;
  * attention WITHOUT 1/sqrt(d) scaling (folded into init, per T5);
  * gated-GELU feed forward (wi_0 * gelu_new, wi_1 gate) — the FLAN variant;
  * no biases anywhere; final RMS layer norm.

Weight conversion from HF checkpoints: ``convert_t5_encoder_state_dict``.
Parity is tested against ``transformers`` on random tiny configs
(tests/test_t5.py).

TPU notes: the encoder runs once per prompt (outside the DDIM scan); padding
to ``max_length`` 100 keeps shapes static.  bf16-able via ``dtype``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ezaudio_tpu.ops.activations import gelu_tanh


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    # "gated-gelu" for FLAN-T5; "relu" for original T5
    feed_forward_proj: str = "gated-gelu"

    @classmethod
    def flan_t5_large(cls):
        return cls(d_model=1024, d_kv=64, d_ff=2816, num_layers=24, num_heads=16)

    @classmethod
    def flan_t5_xl(cls):
        return cls(d_model=2048, d_kv=64, d_ff=5120, num_layers=24, num_heads=32)

    @classmethod
    def from_hf_config(cls, hf) -> "T5EncoderConfig":
        return cls(
            vocab_size=hf.vocab_size, d_model=hf.d_model, d_kv=hf.d_kv,
            d_ff=hf.d_ff, num_layers=hf.num_layers, num_heads=hf.num_heads,
            relative_attention_num_buckets=hf.relative_attention_num_buckets,
            relative_attention_max_distance=hf.relative_attention_max_distance,
            layer_norm_epsilon=hf.layer_norm_epsilon,
            feed_forward_proj=hf.feed_forward_proj,
        )


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = (xf * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return y * w.astype(self.dtype)


def relative_position_bucket(relative_position, num_buckets: int = 32,
                             max_distance: int = 128):
    """Bidirectional T5 bucketing (HF modeling_t5._relative_position_bucket)."""
    num_buckets //= 2
    buckets = jnp.where(relative_position > 0, num_buckets, 0)
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rp, rp_large)


class T5SelfAttention(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        B, L, _ = x.shape
        q = dense("q")(x).reshape(B, L, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        k = dense("k")(x).reshape(B, L, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        v = dense("v")(x).reshape(B, L, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        if self.has_relative_bias:
            bias_emb = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, c.num_heads), jnp.float32)
            pos = jnp.arange(L)
            rel = pos[None, :] - pos[:, None]  # memory - context
            buckets = relative_position_bucket(
                rel, c.relative_attention_num_buckets,
                c.relative_attention_max_distance)
            position_bias = bias_emb[buckets].transpose(2, 0, 1)[None]  # (1,H,L,L)

        # T5: NO 1/sqrt(d) scaling.
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + position_bias.astype(jnp.float32) + mask_bias
        weights = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner)
        out = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="o")(out)
        return out, position_bias


class T5FeedForward(nn.Module):
    cfg: T5EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dense = lambda dim, name: nn.Dense(dim, use_bias=False, dtype=self.dtype,
                                           param_dtype=jnp.float32, name=name)
        if "gated" in c.feed_forward_proj:
            h = gelu_tanh(dense(c.d_ff, "wi_0")(x)) * dense(c.d_ff, "wi_1")(x)
        else:
            h = jax.nn.relu(dense(c.d_ff, "wi")(x))
        return dense(c.d_model, "wo")(h)


class T5Block(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        c = self.cfg
        h = T5LayerNorm(c.d_model, c.layer_norm_epsilon, dtype=self.dtype,
                        name="ln_attn")(x)
        attn, position_bias = T5SelfAttention(
            c, self.has_relative_bias, dtype=self.dtype, name="attn")(
            h, mask_bias, position_bias)
        x = x + attn
        h = T5LayerNorm(c.d_model, c.layer_norm_epsilon, dtype=self.dtype,
                        name="ln_ff")(x)
        x = x + T5FeedForward(c, dtype=self.dtype, name="ff")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    cfg: T5EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        """input_ids (B, L) int32; attention_mask (B, L) bool/int.
        Returns last_hidden_state (B, L, d_model)."""
        c = self.cfg
        emb = self.param("embedding", nn.initializers.normal(1.0),
                         (c.vocab_size, c.d_model), jnp.float32)
        x = emb[input_ids].astype(self.dtype)

        if attention_mask is None:
            mask_bias = jnp.zeros((1, 1, 1, x.shape[1]), jnp.float32)
        else:
            neg = jnp.finfo(jnp.float32).min
            mask_bias = jnp.where(
                attention_mask.astype(bool)[:, None, None, :], 0.0, neg)

        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block_{i}")(x, mask_bias, position_bias)

        x = T5LayerNorm(c.d_model, c.layer_norm_epsilon, dtype=self.dtype,
                       name="final_layer_norm")(x)
        return x


# ---------------------------------------------------------------------------
# HF -> flax conversion
# ---------------------------------------------------------------------------

def convert_t5_encoder_state_dict(sd: Dict[str, Any], cfg: T5EncoderConfig) -> Dict[str, Any]:
    """HF T5EncoderModel state dict (numpy values) -> our params.

    Accepts both ``encoder.block...`` (T5EncoderModel) and plain
    ``block...`` key styles; ``shared.weight`` or
    ``encoder.embed_tokens.weight`` provides the embedding.
    """

    def g(key):
        for k in (key, f"encoder.{key}"):
            if k in sd:
                v = sd[k]
                return v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()
        raise KeyError(key)

    def lin(key):
        return {"kernel": g(key).T}

    if "shared.weight" in sd:
        emb = sd["shared.weight"]
    else:
        emb = g("embed_tokens.weight")
    emb = emb if isinstance(emb, np.ndarray) else emb.detach().cpu().numpy()

    params: Dict[str, Any] = {"embedding": emb}
    for i in range(cfg.num_layers):
        p = f"block.{i}.layer"
        blk = {
            "ln_attn": {"weight": g(f"{p}.0.layer_norm.weight")},
            "attn": {
                "q": lin(f"{p}.0.SelfAttention.q.weight"),
                "k": lin(f"{p}.0.SelfAttention.k.weight"),
                "v": lin(f"{p}.0.SelfAttention.v.weight"),
                "o": lin(f"{p}.0.SelfAttention.o.weight"),
            },
            "ln_ff": {"weight": g(f"{p}.1.layer_norm.weight")},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = g(
                f"{p}.0.SelfAttention.relative_attention_bias.weight")
        if "gated" in cfg.feed_forward_proj:
            blk["ff"] = {
                "wi_0": lin(f"{p}.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{p}.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{p}.1.DenseReluDense.wo.weight"),
            }
        else:
            blk["ff"] = {
                "wi": lin(f"{p}.1.DenseReluDense.wi.weight"),
                "wo": lin(f"{p}.1.DenseReluDense.wo.weight"),
            }
        params[f"block_{i}"] = blk
    params["final_layer_norm"] = {"weight": g("final_layer_norm.weight")}
    return params
