"""DiTControlNet: a conditioned clone of the UDiT in-block stack.

Behavioral parity with reference ``src/models/controlnet.py``:
  * ``ControlNetEmbed`` (DiTControlNetEmbed, :10-84): Conv1d(k1) stem into
    ``blocks[0]`` channels; optional condition span-masking with its own
    ``mask_embed`` + mask-row concat (channels + 1); strided conv pyramid
    [Conv k3 p1 / SiLU / Conv k3 p1 s2 / SiLU] per stage; zero-init Conv1d(k1)
    out to embed_dim;
  * ``DiTControlNet`` (:87-315): clones of patch_embed, PE, time/context
    embedders and the first depth//2 DiT in-blocks; condition added to x
    after patch embed; per-block zero-init Linear skip projections scaled by
    ``conditioning_scale``.

The two-phase inference contract matches inference_controlnet.py:
MaskDiT(forward_model=False) builds the 257-ch concat; this module produces
depth//2 skip tensors; MaskDiT.forward_backbone consumes them.

Weight reuse: ``init_params_from_base`` clones the base UDiT's embedders and
in-blocks (the reference's load-from-base + ``set_trainable`` freeze,
controlnet.py:238-250); ``trainable_mask`` marks controlnet_pre / in_blocks /
zero projections as the trainable subset.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.models.blocks import DiTBlock
from ezaudio_tpu.models.span_mask import compute_span_mask
from ezaudio_tpu.models.udit import UDiT
from ezaudio_tpu.ops.convs import Conv1d, zero_linear
from ezaudio_tpu.ops.embeddings import MLPEmbedder, PatchEmbed1D, PEWrapper, TimestepEmbedder


class ControlNetEmbed(nn.Module):
    in_chans: int
    out_chans: int
    blocks: Tuple[int, ...]
    cond_mask: bool = False
    cond_mask_prob: Optional[float] = None
    cond_mask_ratio: Optional[Tuple[float, float]] = None
    cond_mask_span: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conditioning, cond_mask_infer=None, train: bool = False):
        """conditioning (B, L, in_chans) -> (B, L / 2^(len(blocks)-1), out_chans)."""
        blocks = list(self.blocks)
        x = Conv1d(self.in_chans, blocks[0], 1, dtype=self.dtype, name="conv_in")(conditioning)

        if self.cond_mask:
            B, L, D = x.shape
            embed = self.param("mask_embed", nn.initializers.zeros, (blocks[0],), jnp.float32)
            embed_b = jnp.broadcast_to(embed.astype(x.dtype)[None, None, :], x.shape)
            if train and cond_mask_infer is None:
                k_ratio, k_span, k_batch = jax.random.split(self.make_rng("mask"), 3)
                lo, hi = self.cond_mask_ratio
                ratios = jax.random.uniform(k_ratio, (B,), minval=lo, maxval=hi)
                span = compute_span_mask(k_span, B, L, ratios, self.cond_mask_span)
                # only mask a cond_mask_prob subset of the batch (controlnet.py:56-57)
                sel = jax.random.uniform(k_batch, (B,)) < self.cond_mask_prob
                span = span & sel[:, None]
                mask = jnp.broadcast_to(span[:, :, None], x.shape)
            elif cond_mask_infer is not None:
                mask = jnp.broadcast_to(cond_mask_infer.astype(bool), x.shape)
            else:
                mask = jnp.zeros_like(x, dtype=bool)
            x = jnp.where(mask, embed_b, x)
            x = jnp.concatenate([x, mask[:, :, 0:1].astype(x.dtype)], axis=-1)
            blocks[0] = blocks[0] + 1

        for i in range(len(blocks) - 1):
            cin, cout = blocks[i], blocks[i + 1]
            x = Conv1d(cin, cin, 3, padding=1, dtype=self.dtype, name=f"pyramid{i}_conv1")(x)
            x = nn.silu(x)
            x = Conv1d(cin, cout, 3, padding=1, stride=2, dtype=self.dtype, name=f"pyramid{i}_conv2")(x)
            x = nn.silu(x)

        x = Conv1d(blocks[-1], self.out_chans, 1,
                   zero_init=True, dtype=self.dtype, name="conv_out")(x)
        return x


class DiTControlNet(nn.Module):
    """Conditioned half-depth UDiT returning skip tensors."""

    udit: dict = None  # the base model's UDiT kwargs
    cond_in: int = 1
    cond_blocks: Tuple[int, ...] = (64, 128)
    cond_mask: bool = False
    cond_mask_prob: Optional[float] = None
    cond_mask_ratio: Optional[Tuple[float, float]] = None
    cond_mask_span: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context=None, x_mask=None,
                 context_mask=None, cls_token=None, condition=None,
                 cond_mask_infer=None, conditioning_scale: float = 1.0,
                 train: bool = False):
        """x: (B, T, in_chans) MAE-concatenated input; returns a list of
        depth//2 skip tensors (B, L, D)."""
        cfg = dict(self.udit)
        embed_dim = cfg["embed_dim"]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        x = PatchEmbed1D(patch_size=cfg.get("patch_size", 1), in_chans=cfg["in_chans"],
                         embed_dim=embed_dim, dtype=self.dtype, name="patch_embed")(x)
        cond = ControlNetEmbed(
            in_chans=self.cond_in, out_chans=embed_dim, blocks=tuple(self.cond_blocks),
            cond_mask=self.cond_mask, cond_mask_prob=self.cond_mask_prob,
            cond_mask_ratio=tuple(self.cond_mask_ratio) if self.cond_mask_ratio else None,
            cond_mask_span=self.cond_mask_span, dtype=self.dtype,
            name="controlnet_pre")(condition, cond_mask_infer, train)
        x = x + cond
        x = PEWrapper(dim=embed_dim, method=cfg.get("pe_method", "none"),
                      length=cfg["img_size"] // cfg.get("patch_size", 1),
                      dtype=self.dtype, name="x_pe")(x)

        B, L, D = x.shape
        extras = 0  # adanorm modes only (the EzAudio setting)
        use_adanorm = cfg.get("time_fusion", "token") != "token"
        assert use_adanorm, "ControlNet supports the AdaLN family only"

        context_token = None
        block_context_dim = None
        if cfg.get("context_dim") is not None:
            context_token = MLPEmbedder(in_dim=cfg["context_dim"], dim=embed_dim,
                                        dtype=self.dtype, name="context_embed")(context)
            context_token = PEWrapper(dim=embed_dim,
                                      method=cfg.get("context_pe_method", "none"),
                                      length=cfg.get("context_max_length"),
                                      dtype=self.dtype, name="context_pe")(context_token)
            if cfg.get("context_fusion") == "cross":
                block_context_dim = embed_dim
            else:
                # Concat fusion: same mask bookkeeping as UDiT's
                # _concat_x_context — the context prefix joins the
                # sequence, so its mask must join the key mask (and the
                # reference asserts the fixed prefix length).
                assert context_token.shape[1] == cfg["context_max_length"], (
                    "concat fusion requires context padded to "
                    f"context_max_length={cfg['context_max_length']}, got "
                    f"{context_token.shape[1]}")
                if x_mask is None:
                    x_mask = jnp.ones((B, L), dtype=bool)
                cmask = (context_mask if context_mask is not None else
                         jnp.ones((B, context_token.shape[1]), dtype=bool))
                x = jnp.concatenate([context_token, x], axis=1)
                x_mask = jnp.concatenate([cmask, x_mask], axis=1)
                extras += cfg["context_max_length"]
                context_token, context_mask = None, None

        time_token = TimestepEmbedder(hidden_size=embed_dim, dtype=self.dtype,
                                      name="time_embed")(timesteps)
        time_token = nn.silu(time_token)
        time_ada = None
        if cfg["time_fusion"] in ("ada_single", "ada_sola", "ada_sola_bias"):
            time_ada = zero_linear(embed_dim, 6 * embed_dim, dtype=self.dtype,
                                   name="time_ada")(time_token)

        half = cfg["depth"] // 2
        skips = []
        for i in range(half):
            blk = DiTBlock(
                dim=embed_dim, context_dim=block_context_dim,
                num_heads=cfg["num_heads"], mlp_ratio=cfg.get("mlp_ratio", 4.0),
                qkv_bias=cfg.get("qkv_bias", False), qk_scale=cfg.get("qk_scale"),
                qk_norm=cfg.get("qk_norm"), act_layer=cfg.get("act_layer", "gelu"),
                norm_layer=cfg.get("norm_layer", "layernorm"),
                time_fusion=cfg["time_fusion"],
                ada_sola_rank=cfg.get("ada_sola_rank"),
                ada_sola_alpha=cfg.get("ada_sola_alpha"),
                skip=False, skip_norm=False, rope_mode=cfg.get("rope_mode", "none"),
                context_norm=cfg.get("context_norm", False), extras=extras,
                dtype=self.dtype, name=f"in_blocks_{i}")
            x = blk(x, time_token, time_ada, None, context_token, x_mask, context_mask)
            skips.append(x)

        out = []
        for i, s in enumerate(skips):
            proj = zero_linear(embed_dim, embed_dim, dtype=self.dtype,
                               name=f"zero_blocks_{i}")(s)
            out.append(proj * conditioning_scale)
        return out


def controlnet_from_config(model_cfg: dict, controlnet_cfg: dict,
                           dtype=jnp.float32) -> DiTControlNet:
    """Build from the reference config layout: the ``model:`` block overlaid
    with the ``controlnet:`` block (api/controlnet.py:93-95)."""
    cfg = dict(model_cfg)
    for k in ("mae", "mae_prob", "mask_ratio", "mask_span", "input_type"):
        cfg.pop(k, None)
    return DiTControlNet(
        udit=cfg,
        cond_in=controlnet_cfg["cond_in"],
        cond_blocks=tuple(controlnet_cfg["cond_blocks"]),
        cond_mask=controlnet_cfg.get("cond_mask", False),
        cond_mask_prob=controlnet_cfg.get("cond_mask_prob"),
        cond_mask_ratio=tuple(controlnet_cfg["cond_mask_ratio"])
        if controlnet_cfg.get("cond_mask_ratio") else None,
        cond_mask_span=controlnet_cfg.get("cond_mask_span"),
        dtype=dtype,
    )


def init_params_from_base(cn_params: dict, base_udit_params: dict) -> dict:
    """Clone shared submodules from a base UDiT param tree into a ControlNet
    param tree (reference: ControlNet starts from the pretrained base's
    embedders + in-blocks)."""
    out = jax.tree.map(lambda x: x, cn_params)  # copy
    for name in list(out.keys()):
        if name in base_udit_params and (
            name.startswith("in_blocks_")
            or name in ("patch_embed", "x_pe", "context_embed", "context_pe",
                        "time_embed", "time_ada")
        ):
            out[name] = jax.tree.map(lambda x: x, base_udit_params[name])
    return out


def trainable_mask(cn_params: dict) -> dict:
    """True for the reference's trainable subset (set_trainable,
    controlnet.py:238-250): controlnet_pre, in_blocks, zero projections."""
    def mark(name):
        return (name.startswith("in_blocks_") or name == "controlnet_pre"
                or name.startswith("zero_blocks_"))

    return {
        name: jax.tree.map(lambda _: mark(name), sub)
        for name, sub in cn_params.items()
    }
