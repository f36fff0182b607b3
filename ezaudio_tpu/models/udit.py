"""UDiT: U-shaped 1D diffusion transformer with long skip connections.

Behavioral parity with reference ``src/models/udit.py:10-362``:
  * patch embed -> optional PE -> optional context embed/PE;
  * time fusion: ``token`` (prepended token) or AdaLN family — shared
    ``time_ada`` Linear -> 6*dim plus per-block SOLA deltas, and a separate
    ``time_ada_final`` Linear -> 2*dim for the FinalBlock;
  * context fusion: ``concat``/``joint`` (prefix tokens) or ``cross``
    (per-block cross-attention);
  * depth//2 in-blocks (collect skips) -> mid block -> depth//2 out-blocks
    (pop skips in reverse; ControlNet skips add to the popped skip, or to x
    when long-skips are disabled);
  * FinalBlock with its own shift/scale.

TPU notes: per-block activation rematerialization uses ``nn.remat``
(= jax.checkpoint) when ``use_checkpoint`` is set; the whole forward is
jit-/scan-safe (static shapes, no Python-data-dependent branches at trace
time).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.models.blocks import DiTBlock, FinalBlock
from ezaudio_tpu.ops.convs import zero_linear
from ezaudio_tpu.ops.embeddings import MLPEmbedder, PatchEmbed1D, PEWrapper, TimestepEmbedder


class UDiT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    input_type: str = "1d"
    out_chans: Optional[int] = None
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    qk_norm: Optional[str] = None
    act_layer: str = "gelu"
    norm_layer: str = "layernorm"
    context_norm: bool = False
    use_checkpoint: bool = False
    time_fusion: str = "token"
    ada_sola_rank: Optional[int] = None
    ada_sola_alpha: Optional[float] = None
    cls_dim: Optional[int] = None
    context_dim: Optional[int] = 768
    context_fusion: str = "concat"
    context_max_length: Optional[int] = 128
    context_pe_method: str = "sinu"
    pe_method: str = "abs"
    rope_mode: str = "none"
    use_conv: bool = True
    skip: bool = True
    skip_norm: bool = True
    attention_impl: str = "auto"  # auto | einsum | pallas | flash | ring
    # remat policy under use_checkpoint: "full" recomputes the whole block
    # in backward (minimum memory, +1 forward of FLOPs); "dots" saves
    # matmul outputs and recomputes only elementwise work
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — the
    # standard memory/FLOPs middle ground for transformer training.
    # "auto" reads EZAUDIO_REMAT at trace time (default "full").
    remat_policy: str = "auto"  # auto | full | dots
    dtype: Any = jnp.float32

    @property
    def use_adanorm(self) -> bool:
        return self.time_fusion != "token"

    def _extras(self) -> int:
        extras = 0
        if not self.use_adanorm:
            extras = 2 if self.cls_dim is not None else 1
        if self.context_dim is not None and self.context_fusion in ("concat", "joint"):
            extras += self.context_max_length
        return extras

    @nn.compact
    def __call__(self, x, timesteps, context=None, x_mask=None,
                 context_mask=None, cls_token=None,
                 controlnet_skips: Optional[Sequence[jnp.ndarray]] = None,
                 collect_deep_k: Optional[int] = None,
                 deep_cache: Optional[Tuple[int, jnp.ndarray]] = None):
        """x: (B, T, in_chans) [1d] or (B, H, W, in_chans) [2d];
        timesteps: (B,) or scalar; context: (B, Lc, ctx_dim).

        Cross-step layer caching (training-free DiT acceleration — the
        deep U-stack features drift slowly across adjacent diffusion
        timesteps, so cached steps recompute only the shallow layers):

          * ``collect_deep_k=k``: full forward that ALSO returns the deep
            activation entering ``out_blocks_{half-k}`` (i.e. after
            ``out_blocks_{half-k-1}``) — returns ``(out, deep)``;
          * ``deep_cache=(k, deep)``: cached forward — run
            ``in_blocks_0..k-1`` (fresh skips), substitute ``deep`` for the
            whole ``in_k..mid..out_{half-k-1}`` middle, run
            ``out_blocks_{half-k}..{half-1}`` + FinalBlock.  Embeddings,
            shallow blocks and the final head are always fresh.

        The split is exact at the collection timestep (cached forward with
        the just-collected deep reproduces the full forward bit-for-bit)
        and an approximation at neighbouring timesteps.
        """
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        if self.input_type == "2d":
            from ezaudio_tpu.ops.embeddings import PatchEmbed2D

            Hh, Ww = self.img_size
            num_patches = (Hh // self.patch_size) * (Ww // self.patch_size)
            x = PatchEmbed2D(patch_size=self.patch_size, in_chans=self.in_chans,
                             embed_dim=self.embed_dim, dtype=self.dtype,
                             name="patch_embed")(x)
        else:
            num_patches = self.img_size // self.patch_size
            x = PatchEmbed1D(patch_size=self.patch_size, in_chans=self.in_chans,
                             embed_dim=self.embed_dim, dtype=self.dtype,
                             name="patch_embed")(x)
        x = PEWrapper(dim=self.embed_dim, method=self.pe_method,
                      length=num_patches, dtype=self.dtype, name="x_pe")(x)

        B, L, D = x.shape
        extras = self._extras()

        # --- context ---
        context_token = None
        block_context_dim = None
        if self.context_dim is not None:
            context_token = MLPEmbedder(in_dim=self.context_dim, dim=self.embed_dim,
                                        dtype=self.dtype, name="context_embed")(context)
            context_token = PEWrapper(dim=self.embed_dim, method=self.context_pe_method,
                                      length=self.context_max_length, dtype=self.dtype,
                                      name="context_pe")(context_token)
            if self.context_fusion in ("concat", "joint"):
                # Prefix context tokens onto x (udit.py:_concat_x_context).
                # _extras() assumes exactly context_max_length prefix
                # tokens (FinalBlock stripping, RoPE x_only/dual offsets),
                # and the reference asserts the same — a shorter context
                # would silently corrupt the output.
                if self.context_max_length is not None:
                    assert context_token.shape[1] == self.context_max_length, (
                        "concat fusion requires context padded to "
                        f"context_max_length={self.context_max_length}, "
                        f"got {context_token.shape[1]}")
                if x_mask is None:
                    x_mask = jnp.ones((B, L), dtype=bool)
                if context_mask is None:
                    context_mask = jnp.ones((B, context_token.shape[1]), dtype=bool)
                x = jnp.concatenate([context_token, x], axis=1)
                x_mask = jnp.concatenate([context_mask, x_mask], axis=1)
                context_token, context_mask = None, None
            elif self.context_fusion == "cross":
                block_context_dim = self.embed_dim
            else:
                raise NotImplementedError(self.context_fusion)

        # --- time ---
        time_token = TimestepEmbedder(hidden_size=self.embed_dim, dtype=self.dtype,
                                      name="time_embed")(timesteps)
        if self.cls_dim is not None:
            cls_emb = MLPEmbedder(in_dim=self.cls_dim, dim=self.embed_dim,
                                  dtype=self.dtype,
                                  zero_out=self.use_adanorm,
                                  name="cls_embed")(cls_token)
        time_ada = None
        time_ada_final = None
        if self.use_adanorm:
            if self.cls_dim is not None:
                time_token = time_token + cls_emb
            time_token = nn.silu(time_token)
            time_ada_final = zero_linear(self.embed_dim, 2 * self.embed_dim,
                                         dtype=self.dtype, name="time_ada_final")(time_token)
            if self.time_fusion in ("ada_single", "ada_sola", "ada_sola_bias"):
                time_ada = zero_linear(self.embed_dim, 6 * self.embed_dim,
                                       dtype=self.dtype, name="time_ada")(time_token)
        else:
            tt = time_token[:, None, :]
            if self.cls_dim is not None:
                tt = jnp.concatenate([tt, cls_emb[:, None, :]], axis=1)
            tt = PEWrapper(dim=self.embed_dim, method="abs", length=tt.shape[1],
                           dtype=self.dtype, name="time_pe")(tt)
            x = jnp.concatenate([tt, x], axis=1)
            if x_mask is not None:
                x_mask = jnp.concatenate(
                    [jnp.ones((B, tt.shape[1]), dtype=bool), x_mask], axis=1)
            time_token = None

        if self.use_checkpoint:
            pol = self.remat_policy
            if pol == "auto":
                import os

                pol = os.environ.get("EZAUDIO_REMAT", "full")
            if pol == "dots":
                import jax

                Block = nn.remat(
                    DiTBlock,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable)
            else:
                assert pol == "full", f"unknown remat_policy {pol!r}"
                Block = nn.remat(DiTBlock)
        else:
            Block = DiTBlock

        def run(blk, x, skip=None):
            return blk(x, time_token, time_ada, skip, context_token,
                       x_mask, context_mask)

        def make(idx, with_skip, name):
            return Block(
                dim=self.embed_dim, context_dim=block_context_dim,
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                qk_norm=self.qk_norm, act_layer=self.act_layer,
                norm_layer=self.norm_layer, time_fusion=self.time_fusion,
                ada_sola_rank=self.ada_sola_rank, ada_sola_alpha=self.ada_sola_alpha,
                skip=with_skip, skip_norm=self.skip_norm and with_skip,
                rope_mode=self.rope_mode, context_norm=self.context_norm,
                extras=extras, attention_impl=self.attention_impl,
                dtype=self.dtype, name=name)

        half = self.depth // 2
        cache_k = None
        if deep_cache is not None:
            assert collect_deep_k is None and controlnet_skips is None
            cache_k, deep_x = deep_cache
            assert 1 <= cache_k < half, (cache_k, half)
        if collect_deep_k is not None:
            assert 1 <= collect_deep_k < half, (collect_deep_k, half)

        skips = []
        n_in = cache_k if cache_k is not None else half
        for i in range(n_in):
            x = run(make(i, False, f"in_blocks_{i}"), x)
            if self.skip:
                skips.append(x)

        deep_out = None
        if cache_k is None:
            x = run(make(half, False, "mid_block"), x)

            cn = list(controlnet_skips) if controlnet_skips is not None else None
            for i in range(half):
                if self.skip:
                    skip = skips.pop()
                    if cn:
                        skip = skip + cn.pop()
                else:
                    skip = None
                    if cn:
                        x = x + cn.pop()
                x = run(make(i, self.skip, f"out_blocks_{i}"), x, skip)
                if collect_deep_k is not None and i == half - collect_deep_k - 1:
                    deep_out = x
        else:
            # cached step: substitute the deep activation, refresh only the
            # last cache_k out-blocks (their skips pair with in_0..k-1)
            x = deep_x.astype(x.dtype)
            for i in range(half - cache_k, half):
                skip = skips.pop() if self.skip else None
                x = run(make(i, self.skip, f"out_blocks_{i}"), x, skip)

        out_chans = self.out_chans if self.out_chans is not None else self.in_chans
        x = FinalBlock(embed_dim=self.embed_dim, patch_size=self.patch_size,
                       out_chans=out_chans, norm_layer=self.norm_layer,
                       use_conv=self.use_conv, use_adanorm=self.use_adanorm,
                       input_type=self.input_type,
                       img_size=self.img_size if self.input_type == "2d" else None,
                       dtype=self.dtype, name="final_block")(
            x, time_ada=time_ada_final, extras=extras)
        if collect_deep_k is not None:
            return x, deep_out
        return x
