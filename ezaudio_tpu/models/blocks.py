"""DiT building blocks: multi-head attention, AdaLN(-SOLA), DiTBlock, FinalBlock.

Behavioral parity with reference ``src/models/blocks.py`` and
``src/models/utils/attention.py``; architecture is reshaped for TPU:
  * channel-last tokens (B, L, D);
  * q/k/v in one trace, einsum attention (MXU), f32 softmax;
  * RoPE tables precomputed at trace time;
  * gate convention kept EXACTLY as the reference:  ``x + (1 - gate) * f(x)``
    (blocks.py:139,156 — note the unusual ``1 - gate``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.ops.attention import dot_product_attention, make_attention_mask
from ezaudio_tpu.ops.convs import Conv1d, xavier_linear, zero_linear, Linear
from ezaudio_tpu.ops.embeddings import unpatchify_1d
from ezaudio_tpu.ops.mlp import FeedForward, film_modulate
from ezaudio_tpu.ops.norms import LayerNorm, RMSNorm, make_norm
from ezaudio_tpu.ops.rope import apply_rope_skip_prefix, rope_tables


# ---------------------------------------------------------------------------
# Trace-time attention-impl override (mirrors ops/quant.py::quant_context):
# `attention_impl="auto"` modules resolve their implementation at TRACE time
# from this context, falling back to the EZAUDIO_ATTN_IMPL env var.  The
# public API threads its `attn_impl=` acceleration knob through here (and
# keys its jit cache on it) so per-call selection works despite jit caching.
# ---------------------------------------------------------------------------

import contextlib
import os
import threading

_attn_state = threading.local()


def current_attention_impl() -> str:
    """The attention impl an `attention_impl='auto'` module should trace
    with: innermost :func:`attention_impl_context` value, else the
    ``EZAUDIO_ATTN_IMPL`` env var, else ``'auto'`` (geometry-based choice
    in ``Attention.__call__``)."""
    override = getattr(_attn_state, "impl", None)
    if override is not None:
        return override
    return os.environ.get("EZAUDIO_ATTN_IMPL", "auto")


@contextlib.contextmanager
def attention_impl_context(impl: Optional[str]):
    """Trace-time override of the attention implementation.

    ``None`` is a no-op (defer to env/auto).  Valid impls: einsum (auto),
    ``bf16``/``chunked``/``chunked_bf16`` (probe11 batch-scaling variants,
    chunked_bf16 is ~9% faster at every batch and FAD-neutral at mid scale
    — BASELINE.md round-3 sections), ``pallas``, ``flash``, ``ring``.
    """
    prev = getattr(_attn_state, "impl", None)
    _attn_state.impl = impl if impl is not None else prev
    try:
        yield
    finally:
        _attn_state.impl = prev


class _LinearParams(nn.Module):
    """Declare Linear-shaped params without computing — lets the fused-QKV
    path share the exact param tree of three separate Linears."""

    in_features: int
    out_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (self.in_features, self.out_features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Attention(nn.Module):
    """Unified self/cross attention (reference attention.py:40-150).

    * separate q/k/v projections (cross-attn keys come from ``context``);
    * optional per-head q/k LayerNorm or RMSNorm on head_dim;
    * RoPE modes: none / shared / x_only / dual, where x_only and dual
      rotate only the non-``extras`` positions;
    * boolean key mask, True = attend.
    """

    dim: int
    num_heads: int
    context_dim: Optional[int] = None
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    qk_norm: Optional[str] = None
    rope_mode: str = "none"
    zero_proj: bool = False  # zero-init output proj (cross-attn, udit.py init)
    extras: int = 0  # prefix tokens excluded from RoPE in x_only/dual modes
    attention_impl: str = "auto"  # auto | einsum | pallas | flash | ring
    # Packing q/k/v into one (D, 3D) matmul measured 3% SLOWER end-to-end
    # (BASELINE.md: XLA re-materializes the weight concat inside the scan
    # rather than hoisting it); kept as an opt-in for future param-layout
    # work where the packed weight is stored directly.
    fused_qkv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context_mask=None):
        extras = self.extras
        B, L, _ = x.shape
        cross = context is not None
        ctx = context if cross else x
        ctx_dim = self.context_dim if (cross and self.context_dim) else self.dim
        H = self.num_heads
        head_dim = self.dim // H
        scale = self.qk_scale or head_dim**-0.5

        if not cross and self.fused_qkv:
            # one packed (D, 3D) matmul instead of three.  The params keep
            # the converter-compatible to_q/to_k/to_v names and shapes; the
            # weight concat is loop-invariant, so XLA hoists it out of the
            # sampling scan.
            parts = [_LinearParams(self.dim, self.dim, self.qkv_bias, name=n)()
                     for n in ("to_q", "to_k", "to_v")]
            W = jnp.concatenate([p[0] for p in parts], axis=1).astype(self.dtype)
            qkv = jnp.dot(x, W, preferred_element_type=self.dtype)
            if self.qkv_bias:
                b = jnp.concatenate([p[1] for p in parts]).astype(self.dtype)
                qkv = qkv + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = xavier_linear(self.dim, self.dim, dtype=self.dtype, use_bias=self.qkv_bias, name="to_q")(x)
            k = xavier_linear(ctx_dim, self.dim, dtype=self.dtype, use_bias=self.qkv_bias, name="to_k")(ctx)
            v = xavier_linear(ctx_dim, self.dim, dtype=self.dtype, use_bias=self.qkv_bias, name="to_v")(ctx)

        Lk = ctx.shape[1]
        q = q.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, head_dim).transpose(0, 2, 1, 3)

        if self.qk_norm == "layernorm":
            q = LayerNorm(dim=head_dim, dtype=self.dtype, name="norm_q")(q)
            k = LayerNorm(dim=head_dim, dtype=self.dtype, name="norm_k")(k)
        elif self.qk_norm == "rmsnorm":
            q = RMSNorm(dim=head_dim, dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(dim=head_dim, dtype=self.dtype, name="norm_k")(k)
        elif self.qk_norm is not None:
            raise NotImplementedError(self.qk_norm)

        if self.rope_mode != "none":
            assert not cross, "RoPE only applies to self-attention"
            cos, sin = rope_tables(L, head_dim)
            if self.rope_mode == "shared":
                q = apply_rope_skip_prefix(q, cos, sin, 0)
                k = apply_rope_skip_prefix(k, cos, sin, 0)
            elif self.rope_mode in ("x_only", "dual"):
                # dual uses a second rotary for the prefix; with the standard
                # table both rotaries are identical functions of position, so
                # rotating the prefix with its own position-0-based table:
                if self.rope_mode == "x_only":
                    q = apply_rope_skip_prefix(q, cos, sin, extras)
                    k = apply_rope_skip_prefix(k, cos, sin, extras)
                else:
                    # dual: separate rotaries for prefix and content, each
                    # position-0-based (attention.py:96-99)
                    cp, sp = cos[:extras], sin[:extras]
                    cx, sx = cos[: L - extras], sin[: L - extras]
                    qp = apply_rope_skip_prefix(q[:, :, :extras], cp, sp, 0)
                    kp = apply_rope_skip_prefix(k[:, :, :extras], cp, sp, 0)
                    qx = apply_rope_skip_prefix(q[:, :, extras:], cx, sx, 0)
                    kx = apply_rope_skip_prefix(k[:, :, extras:], cx, sx, 0)
                    q = jnp.concatenate([qp, qx], axis=2)
                    k = jnp.concatenate([kp, kx], axis=2)
            else:
                raise NotImplementedError(self.rope_mode)

        impl = self.attention_impl
        if impl == "auto":
            impl = current_attention_impl()
        if impl == "auto":
            # Inside a ring_context with an sp>1 mesh, self-attention routes
            # through the sequence-parallel ring kernel (the context promises
            # this for impl='auto'); otherwise, measured same-session A/B at
            # the XL geometry (BASELINE.md): XLA's batched attention beats
            # the single-block Pallas kernel by ~27% end-to-end (the kernel
            # pads head_dim 72->128 and its grid programs serialize per
            # (batch, head)).  Default to einsum; the Pallas kernel stays
            # available via attention_impl="pallas" or EZAUDIO_ATTN_IMPL.
            from ezaudio_tpu.parallel.ring_attention import (
                current_ring_context)

            rctx = current_ring_context()
            if rctx is not None and not cross and \
                    rctx[0].shape.get(rctx[1], 1) > 1:
                impl = "ring"
            else:
                impl = "einsum"
        if impl == "ring" and not cross:
            # Sequence-parallel exact attention: latent frames sharded over
            # the mesh's sp axis, K/V blocks rotated around the ICI ring
            # (parallel/ring_attention.py).  Requires an enclosing
            # ring_context(mesh); cross-attention (short text kv) falls
            # through to einsum below.
            from ezaudio_tpu.parallel.ring_attention import (
                current_ring_context, ring_attention)

            rctx = current_ring_context()
            assert rctx is not None, (
                "attention_impl='ring' requires tracing inside "
                "ring_context(mesh, ...)")
            mesh, sp_axis, baxes = rctx
            out = ring_attention(q, k, v, mesh, key_mask=context_mask,
                                 scale=scale, axis=sp_axis, batch_axes=baxes)
        elif impl == "pallas":
            from ezaudio_tpu.ops.pallas.attention import fused_attention

            out = fused_attention(q, k, v, key_mask=context_mask, scale=scale)
        elif impl == "flash" and ctx.shape[1] >= 256:
            # jax's production TPU flash kernel: no logits materialization.
            # Short-kv cross-attention stays on the einsum path (the kernel
            # would pad kv 100 -> 128 for no bandwidth win).
            from ezaudio_tpu.ops.attention import flash_attention_tpu

            out = flash_attention_tpu(q, k, v, key_mask=context_mask,
                                      scale=scale)
        elif impl in ("bf16", "chunked", "chunked_bf16"):
            # batch-scaling variants (VERDICT r2 item 5): bf16 halves the
            # score-matrix HBM traffic; 'chunked' scans Lq tiles so only a
            # (B, H, 128, Lk) score tile is live at a time.  Measured A/B:
            # scripts/perf_probe11.py / BASELINE.md round-3 section.
            sm = jnp.bfloat16 if impl.endswith("bf16") else jnp.float32
            mask = make_attention_mask(L, context_mask)
            if impl.startswith("chunked"):
                from ezaudio_tpu.ops.attention import (
                    chunked_dot_product_attention)

                out = chunked_dot_product_attention(
                    q, k, v, mask=mask, scale=scale, softmax_dtype=sm)
            else:
                out = dot_product_attention(q, k, v, mask=mask, scale=scale,
                                            softmax_dtype=sm)
        else:
            mask = make_attention_mask(L, context_mask)
            out = dot_product_attention(q, k, v, mask=mask, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        proj = zero_linear if self.zero_proj else xavier_linear
        return proj(self.dim, self.dim, dtype=self.dtype, name="proj")(out)


class AdaLN(nn.Module):
    """Adaptive layer-norm modulation head (reference blocks.py:9-48).

    Modes:
      * ``ada``          — per-block Linear(time_token) -> 6*dim (zero-init);
      * ``ada_single``   — shared 6*dim vector + per-block (6, dim) table;
      * ``ada_sola``     — shared vector + rank-r LoRA delta
                           ``lora_b(lora_a(time_token)) * alpha/r``;
      * ``ada_sola_bias``— ada_sola + the (6, dim) table (EzAudio setting).

    Returns modulation of shape (B, 6, dim) laid out as
    [shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp].
    """

    dim: int
    ada_mode: str = "ada"
    r: Optional[int] = None
    alpha: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, time_token=None, time_ada=None):
        if self.ada_mode == "ada":
            assert time_ada is None
            out = zero_linear(self.dim, 6 * self.dim, dtype=self.dtype, name="time_ada")(time_token)
            return out.reshape(-1, 6, self.dim)
        if self.ada_mode == "ada_single":
            table = self.param("scale_shift_table", nn.initializers.zeros, (6, self.dim), jnp.float32)
            return time_ada.reshape(-1, 6, self.dim) + table[None].astype(self.dtype)
        if self.ada_mode in ("ada_sola", "ada_sola_bias"):
            # torch kaiming_uniform(a=sqrt(5)): U(+-1/sqrt(fan_in))
            lora_a = Linear(self.in_dim_a(), self.r * 6, use_bias=False, dtype=self.dtype, name="lora_a")(time_token)
            delta = zero_linear(self.r * 6, self.dim * 6, use_bias=False, dtype=self.dtype, name="lora_b")(lora_a)
            out = time_ada + delta * (self.alpha / self.r)
            out = out.reshape(-1, 6, self.dim)
            if self.ada_mode == "ada_sola_bias":
                table = self.param("scale_shift_table", nn.initializers.zeros, (6, self.dim), jnp.float32)
                out = out + table[None].astype(self.dtype)
            return out
        raise NotImplementedError(self.ada_mode)

    def in_dim_a(self):
        return self.dim


class SkipFusion(nn.Module):
    """Long-skip fusion: ``Linear(norm(cat[x, skip]))`` (blocks.py:99-103,124-128)."""

    dim: int
    skip_norm: bool = True
    norm_layer: str = "layernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        cat = jnp.concatenate([x, skip], axis=-1)
        if self.skip_norm:
            cat = make_norm(self.norm_layer, 2 * self.dim, dtype=self.dtype, name="skip_norm")(cat)
        return xavier_linear(2 * self.dim, self.dim, dtype=self.dtype, name="skip_linear")(cat)


class DiTBlock(nn.Module):
    """Pre-LN DiT block with AdaLN FiLM + ``(1-gate)`` residuals
    (reference blocks.py:51-160)."""

    dim: int
    num_heads: int
    context_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    qk_norm: Optional[str] = None
    act_layer: str = "gelu"
    norm_layer: str = "layernorm"
    time_fusion: str = "none"
    ada_sola_rank: Optional[int] = None
    ada_sola_alpha: Optional[float] = None
    skip: bool = False
    skip_norm: bool = False
    rope_mode: str = "none"
    context_norm: bool = False
    use_checkpoint: bool = False
    extras: int = 0
    attention_impl: str = "auto"  # auto | einsum | pallas | flash | ring
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_token=None, time_ada=None, skip=None,
                 context=None, x_mask=None, context_mask=None):
        from ezaudio_tpu.parallel.mesh import constrain_batch

        use_adanorm = self.time_fusion != "token"
        # under an activation_sharding context (fsdp training), pin the
        # block input to batch sharding — see parallel/mesh.py
        x = constrain_batch(x)

        if self.skip:
            assert skip is not None
            x = SkipFusion(dim=self.dim, skip_norm=self.skip_norm,
                           norm_layer=self.norm_layer, dtype=self.dtype,
                           name="skip_fusion")(x, skip)

        if use_adanorm:
            mod = AdaLN(dim=self.dim, ada_mode=self.time_fusion,
                        r=self.ada_sola_rank, alpha=self.ada_sola_alpha,
                        dtype=self.dtype, name="adaln")(time_token, time_ada)
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = [
                mod[:, i : i + 1, :] for i in range(6)
            ]

        # --- self attention ---
        h = make_norm(self.norm_layer, self.dim, dtype=self.dtype, name="norm1")(x)
        if use_adanorm:
            h = film_modulate(h, shift=shift_msa, scale=scale_msa)
        attn_out = Attention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, qk_norm=self.qk_norm,
            rope_mode=self.rope_mode, extras=self.extras,
            attention_impl=self.attention_impl, dtype=self.dtype,
            name="attn",
        )(h, context=None, context_mask=x_mask)
        x = x + ((1 - gate_msa) * attn_out if use_adanorm else attn_out)

        # --- cross attention ---
        if self.context_dim is not None:
            assert context is not None
            h = make_norm(self.norm_layer, self.dim, dtype=self.dtype, name="norm2")(x)
            if self.context_norm:
                ctx = constrain_batch(
                    make_norm(self.norm_layer, self.context_dim,
                              dtype=self.dtype, name="norm_context")(context))
            else:
                ctx = constrain_batch(context)
            x = x + Attention(
                dim=self.dim, num_heads=self.num_heads,
                context_dim=self.context_dim, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, qk_norm=self.qk_norm,
                rope_mode="none", zero_proj=True, dtype=self.dtype,
                name="cross_attn",
            )(h, context=ctx, context_mask=context_mask)

        # --- mlp ---
        h = make_norm(self.norm_layer, self.dim, dtype=self.dtype, name="norm3")(x)
        if use_adanorm:
            h = film_modulate(h, shift=shift_mlp, scale=scale_mlp)
        mlp_out = FeedForward(dim=self.dim, mult=self.mlp_ratio,
                              activation_fn=self.act_layer, dtype=self.dtype,
                              name="mlp")(h)
        x = x + ((1 - gate_mlp) * mlp_out if use_adanorm else mlp_out)
        return x


class FinalBlock(nn.Module):
    """Final projection: strip extras, AdaLN-modulated norm, linear to
    patch_dim, unpatchify, optional width-3 output conv (blocks.py:163-211).
    1d and 2d variants (2d: p^2*C patch dim, 3x3 output Conv2d)."""

    embed_dim: int
    patch_size: int
    out_chans: int
    norm_layer: str = "layernorm"
    use_conv: bool = True
    use_adanorm: bool = True
    input_type: str = "1d"
    img_size: tuple = None  # (H, W), 2d only
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_ada=None, extras: int = 0):
        x = x[:, extras:, :]
        h = make_norm(self.norm_layer, self.embed_dim, dtype=self.dtype, name="norm")(x)
        if self.use_adanorm:
            B = x.shape[0]
            mod = time_ada.reshape(B, 2, self.embed_dim)
            shift, scale = mod[:, 0:1, :], mod[:, 1:2, :]
            h = film_modulate(h, shift, scale)
        if self.input_type == "2d":
            from ezaudio_tpu.ops.convs import Conv2d
            from ezaudio_tpu.ops.embeddings import unpatchify_2d

            patch_dim = self.patch_size**2 * self.out_chans
            h = xavier_linear(self.embed_dim, patch_dim, dtype=self.dtype, name="linear")(h)
            h = unpatchify_2d(h, self.out_chans, tuple(self.img_size))
            if self.use_conv:
                h = Conv2d(self.out_chans, self.out_chans, (3, 3),
                           padding=(1, 1), dtype=self.dtype, name="final_conv")(h)
            return h
        patch_dim = self.patch_size * self.out_chans
        h = xavier_linear(self.embed_dim, patch_dim, dtype=self.dtype, name="linear")(h)
        h = unpatchify_1d(h, self.out_chans)
        if self.use_conv:
            h = Conv1d(
                in_channels=self.out_chans, out_channels=self.out_chans,
                kernel_size=3, padding=1, dtype=self.dtype, name="final_conv",
            )(h)
        return h
