"""MaskDiT: MAE span-masked wrapper around UDiT.

Behavioral parity with reference ``src/models/conditioners.py:123-183``:
  * owns a learnable ``mask_embed`` (zeros-init, shape (out_chans,));
  * training: per-sample mask ratio ~ U(mask_ratio), span masks of width
    ``mask_span``; MAE applies to a random ``mae_prob`` subset of the batch,
    the remaining samples get a fully-masked gt (mask row all ones);
  * inference: caller-provided ``mae_mask_infer`` (editing) or no gt at all
    (pure generation -> gt = mask_embed everywhere, mask row = 1);
  * the UDiT input is ``concat([x, gt, mask_row], channel)`` ->
    in_chans = 2*C + 1 (= 257 for EzAudio);
  * ``forward_model=False`` returns the concatenated input for the
    ControlNet two-phase call.

Masking here is a `jnp.where` select — no boolean scatter — and span
sampling runs in-graph (see span_mask.py), removing the reference's
per-step host round-trip (conditioners.py:138-148).

Layout: latents are channel-last (B, L, C).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ezaudio_tpu.models.span_mask import compute_span_mask
from ezaudio_tpu.models.udit import UDiT


class MaskDiT(nn.Module):
    # MAE settings (conditioners.py:124-131)
    mae: bool = False
    mae_prob: float = 0.5
    mask_ratio: Tuple[float, float] = (0.25, 1.0)
    mask_span: int = 10
    # Everything else forwards to UDiT.
    udit: dict = None
    dtype: Any = jnp.float32

    def setup(self):
        kwargs = dict(self.udit or {})
        self.model = UDiT(dtype=self.dtype, **kwargs)
        if self.mae:
            out_chans = kwargs.get("out_chans") or kwargs.get("in_chans")
            self.mask_embed = self.param(
                "mask_embed", nn.initializers.zeros, (out_chans,), jnp.float32
            )

    def __call__(
        self,
        x,
        timesteps,
        context=None,
        x_mask=None,
        context_mask=None,
        cls_token=None,
        gt=None,
        mae_mask_infer=None,
        forward_model: bool = True,
        train: bool = False,
        controlnet_skips: Optional[Sequence[jnp.ndarray]] = None,
        collect_deep_k: Optional[int] = None,
        deep_cache: Optional[Tuple[int, jnp.ndarray]] = None,
    ):
        """Returns (output, mae_mask) with mae_mask float (B, L, C).

        Branch selection follows the REFERENCE exactly (conditioners.py
        :161-175): ``gt`` + ``mae_mask_infer`` -> caller-provided editing
        mask; ``gt`` alone -> random span masking (requires the 'mask'
        rng) REGARDLESS of ``train`` — the torch reference does not gate
        on training mode either, and eval_udit renders MAE masks this
        way.  ``train`` is accepted for API symmetry only.

        ``collect_deep_k`` / ``deep_cache`` forward to UDiT's cross-step
        layer caching (see udit.py): with ``collect_deep_k`` the output
        slot is the tuple ``(out, deep)``."""
        B, L, C = x.shape
        mae_mask = jnp.ones_like(x)

        if self.mae:
            embed = jnp.broadcast_to(
                self.mask_embed.astype(x.dtype)[None, None, :], (B, L, self.mask_embed.shape[0])
            )
            if gt is not None:
                if mae_mask_infer is not None:
                    # Inference (editing): mask provided by the caller.
                    mask = jnp.broadcast_to(mae_mask_infer.astype(bool), gt.shape)
                    gt = jnp.where(mask, embed, gt)
                    mae_mask = mask.astype(x.dtype)
                else:
                    # Training: in-graph span masking + MAE batch selection
                    # (conditioners.py:156-172).
                    k_ratio, k_span, k_batch = jax.random.split(self.make_rng("mask"), 3)
                    lo, hi = self.mask_ratio
                    ratios = jax.random.uniform(k_ratio, (B,), minval=lo, maxval=hi)
                    span = compute_span_mask(k_span, B, L, ratios, self.mask_span)
                    mask = jnp.broadcast_to(span[:, :, None], gt.shape)
                    gt = jnp.where(mask, embed, gt)
                    mae_mask = mask.astype(x.dtype)
                    # Samples NOT selected for MAE get a fully-masked gt.
                    mae_sel = jax.random.uniform(k_batch, (B,)) < self.mae_prob
                    sel = mae_sel[:, None, None]
                    gt = jnp.where(sel, gt, embed)
                    mae_mask = jnp.where(sel, mae_mask, jnp.ones_like(mae_mask))
            else:
                gt = embed
            x = jnp.concatenate([x, gt, mae_mask[:, :, 0:1]], axis=-1)

        if not forward_model:
            return x, mae_mask

        out = self.model(
            x=x, timesteps=timesteps, context=context, x_mask=x_mask,
            context_mask=context_mask, cls_token=cls_token,
            controlnet_skips=controlnet_skips,
            collect_deep_k=collect_deep_k, deep_cache=deep_cache,
        )
        return out, mae_mask

    def forward_backbone(self, x_concat, timesteps, context=None, x_mask=None,
                         context_mask=None, cls_token=None, controlnet_skips=None):
        """Run the inner UDiT on an already-concatenated input — the
        ControlNet second phase (inference_controlnet.py:97-99)."""
        return self.model(
            x=x_concat, timesteps=timesteps, context=context, x_mask=x_mask,
            context_mask=context_mask, cls_token=cls_token,
            controlnet_skips=controlnet_skips,
        )


def maskdit_from_config(model_cfg: dict, dtype=jnp.float32) -> MaskDiT:
    """Build MaskDiT from a reference-format ``model:`` config block
    (e.g. ``configs/ezaudio-xl.yml``)."""
    cfg = dict(model_cfg)
    mae = cfg.pop("mae", False)
    mae_prob = cfg.pop("mae_prob", 0.5)
    mask_ratio = tuple(cfg.pop("mask_ratio", (0.25, 1.0)))
    mask_span = cfg.pop("mask_span", 10)
    cfg.pop("input_type", None)  # only '1d' is supported / used
    return MaskDiT(
        mae=mae, mae_prob=mae_prob, mask_ratio=mask_ratio, mask_span=mask_span,
        udit=cfg, dtype=dtype,
    )
