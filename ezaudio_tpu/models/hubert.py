"""Native flax HuBERT encoder — the ContentVec feature tower for the
voice-conversion conditioner.

Reference: ``/root/reference/src/models/conditions/voice.py:19-36`` loads
``HubertModelWithFinalProj`` (transformers' HubertModel + a 768->256
``final_proj`` kept only for checkpoint compatibility — the extractor uses
``last_hidden_state``, never the projection).  This module implements the
same architecture from scratch in flax (same pattern as the T5 port in
``ezaudio_tpu/text/t5.py``): channel-last convs, erf GELU (torch
``nn.GELU`` default), post-LN encoder blocks (``do_stable_layer_norm:
false``), plus a state-dict converter from the HF checkpoint format.

TPU notes: everything is static-shape and jit-friendly; the 7-layer conv
feature extractor (x320 downsample) runs as channel-last ``lax`` convs that
XLA tiles onto the MXU; attention is the same einsum path the DiT uses.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"   # "group" (base) | "layer" (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    classifier_proj_size: int = 256

    @classmethod
    def from_hf_config(cls, hf) -> "HubertConfig":
        return cls(
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            conv_dim=tuple(hf.conv_dim),
            conv_kernel=tuple(hf.conv_kernel),
            conv_stride=tuple(hf.conv_stride),
            conv_bias=hf.conv_bias,
            feat_extract_norm=hf.feat_extract_norm,
            num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
            do_stable_layer_norm=hf.do_stable_layer_norm,
            layer_norm_eps=hf.layer_norm_eps,
            classifier_proj_size=hf.classifier_proj_size,
        )


def _gelu(x):
    # torch nn.GELU default: exact erf form
    return nn.gelu(x, approximate=False)


class _FeatureEncoder(nn.Module):
    """7-layer strided conv stack, 16 kHz waveform -> 50 Hz features
    (x320 downsample).  First layer carries a GroupNorm(512 groups == per-
    channel instance norm) in the 'group' variant; 'layer' puts a LayerNorm
    after every conv."""

    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, 1)
        c = self.cfg
        for i, (dim, k, s) in enumerate(
                zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            if c.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=c.layer_norm_eps,
                                 dtype=self.dtype, name="group_norm")(x)
            elif c.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                 name=f"layer_norm_{i}")(x)
            x = _gelu(x)
        return x  # (B, T', conv_dim[-1])


class _PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        c = self.cfg
        k = c.num_conv_pos_embeddings
        pad = k // 2
        y = nn.Conv(c.hidden_size, (k,), padding=[(pad, pad)],
                    feature_group_count=c.num_conv_pos_embedding_groups,
                    dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:  # SamePadLayer: drop the trailing column
            y = y[:, :-1, :]
        return _gelu(y)


class _Attention(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias=None):
        c = self.cfg
        D, H = c.hidden_size, c.num_attention_heads
        hd = D // H

        def proj(name):
            return nn.Dense(D, dtype=self.dtype, name=name)

        q = proj("q_proj")(x) * (hd ** -0.5)
        k = proj("k_proj")(x)
        v = proj("v_proj")(x)
        B, L, _ = x.shape
        q = q.reshape(B, L, H, hd)
        k = k.reshape(B, L, H, hd)
        v = v.reshape(B, L, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask_bias is not None:
            logits = logits + mask_bias
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, D)
        return proj("out_proj")(o)


class _FeedForward(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(x)
        x = _gelu(x)
        return nn.Dense(c.hidden_size, dtype=self.dtype,
                        name="output_dense")(x)


class _EncoderLayer(nn.Module):
    """Encoder block.  Post-LN when do_stable_layer_norm=False (the
    base/ContentVec variant): residual -> LN after attention, then FF -> LN.
    Pre-LN when True (the large variant): LN -> attention -> residual,
    LN -> FF -> residual."""

    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias=None):
        c = self.cfg
        if c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="layer_norm")(x)
            x = x + _Attention(c, dtype=self.dtype, name="attention")(
                h, mask_bias)
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="final_layer_norm")(x)
            return x + _FeedForward(c, dtype=self.dtype,
                                    name="feed_forward")(h)
        a = _Attention(c, dtype=self.dtype, name="attention")(x, mask_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x + a)
        f = _FeedForward(c, dtype=self.dtype, name="feed_forward")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x + f)


class HubertEncoder(nn.Module):
    """HubertModel equivalent: returns ``last_hidden_state`` (B, L, D)."""

    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio, attention_mask: Optional[jnp.ndarray] = None):
        """``audio``: (B, T) 16 kHz waveform; optional (B, T) bool mask."""
        c = self.cfg
        x = _FeatureEncoder(c, dtype=self.dtype, name="feature_extractor")(
            audio[..., None])

        # feature projection: LN -> Linear(conv_dim[-1] -> hidden)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="fp_projection")(x)

        mask_bias = None
        if attention_mask is not None:
            # downsample the sample mask to feature frames the way HF does:
            # a frame is valid if its last covered sample is valid
            frame_mask = _feature_vector_mask(c, attention_mask, x.shape[1])
            x = jnp.where(frame_mask[..., None], x, 0.0)
            mask_bias = jnp.where(frame_mask, 0.0, -1e9)[:, None, None, :]

        pos = _PositionalConvEmbedding(c, dtype=self.dtype,
                                       name="pos_conv_embed")(x)
        x = x + pos
        if not c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="encoder_layer_norm")(x)
        for i in range(c.num_hidden_layers):
            x = _EncoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, mask_bias)
        if c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                             name="encoder_layer_norm")(x)
        return x


def _feature_vector_mask(cfg: HubertConfig, attention_mask, n_frames: int):
    lengths = attention_mask.astype(jnp.int32).sum(-1)
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths = (lengths - k) // s + 1
    idx = jnp.arange(n_frames)[None, :]
    return idx < lengths[:, None]


# ---------------------------------------------------------------------------
# HF checkpoint -> flax params
# ---------------------------------------------------------------------------

def _fold_weight_norm(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """Fold torch weight_norm(dim=2) on the pos-conv weight.  Handles both
    the legacy ``weight_g/weight_v`` and the parametrize-era
    ``parametrizations.weight.original0/1`` key formats."""
    if f"{base}.weight_g" in sd:
        g, v = sd[f"{base}.weight_g"], sd[f"{base}.weight_v"]
    elif f"{base}.parametrizations.weight.original0" in sd:
        g = sd[f"{base}.parametrizations.weight.original0"]
        v = sd[f"{base}.parametrizations.weight.original1"]
    else:
        return sd[f"{base}.weight"]
    g = np.asarray(g, np.float32)
    v = np.asarray(v, np.float32)
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_hubert_state_dict(sd: Dict[str, Any],
                              cfg: HubertConfig) -> Dict[str, Any]:
    """transformers HubertModel state_dict -> flax params for
    :class:`HubertEncoder`.  ``final_proj``/``masked_spec_embed`` entries
    (checkpoint-compat only) are ignored."""
    sd = {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32)
          for k, v in sd.items()}
    # tolerate a 'hubert.' or 'encoder.' wrapper prefix
    for pref in ("hubert.",):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):] if k.startswith(pref) else k: v
                  for k, v in sd.items()}

    p: Dict[str, Any] = {}

    def conv_kernel(w):  # torch (out, in/groups, k) -> flax (k, in/groups, out)
        return jnp.asarray(w.transpose(2, 1, 0))

    def lin(key):
        out = {"kernel": jnp.asarray(sd[f"{key}.weight"].T)}
        if f"{key}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{key}.bias"])
        return out

    def ln(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_kernel)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": conv_kernel(sd[f"{base}.conv.weight"])}
        if f"{base}.conv.bias" in sd:
            conv["bias"] = jnp.asarray(sd[f"{base}.conv.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = ln(f"{base}.layer_norm")
        elif cfg.feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = ln(f"{base}.layer_norm")
    p["feature_extractor"] = fe

    p["fp_layer_norm"] = ln("feature_projection.layer_norm")
    p["fp_projection"] = lin("feature_projection.projection")

    pc_w = _fold_weight_norm(sd, "encoder.pos_conv_embed.conv")
    p["pos_conv_embed"] = {"conv": {
        "kernel": conv_kernel(pc_w),
        "bias": jnp.asarray(sd["encoder.pos_conv_embed.conv.bias"]),
    }}
    p["encoder_layer_norm"] = ln("encoder.layer_norm")

    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "attention": {n: lin(f"{base}.attention.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm": ln(f"{base}.layer_norm"),
            "feed_forward": {
                "intermediate_dense": lin(f"{base}.feed_forward.intermediate_dense"),
                "output_dense": lin(f"{base}.feed_forward.output_dense"),
            },
            "final_layer_norm": ln(f"{base}.final_layer_norm"),
        }
    return p


# ---------------------------------------------------------------------------
# The voice-conversion extractor (reference voice.py:19-36)
# ---------------------------------------------------------------------------

class VoiceConversionExtractor:
    """ContentVec/HuBERT content features from waveform.

    Mirrors the reference: resample to 16 kHz, symmetric 40-sample pad
    ((400-320)//2 — aligns the conv receptive field like fairseq), encoder
    forward, return ``last_hidden_state`` (B, T50, hidden).

    ``weights``: a transformers-format state dict (e.g. torch.load of a
    local ContentVec checkpoint), or None for random init (tests).
    """

    def __init__(self, sr: int, cfg: Optional[HubertConfig] = None,
                 weights: Optional[Dict[str, Any]] = None,
                 dtype: Any = jnp.float32):
        import jax

        self.sr = sr
        self.target_sr = 16000
        self.cfg = cfg or HubertConfig()
        self.model = HubertEncoder(self.cfg, dtype=dtype)
        if weights is not None:
            self.params = convert_hubert_state_dict(weights, self.cfg)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 800)))["params"]
        self._fwd = jax.jit(
            lambda p, a: self.model.apply({"params": p}, a))

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        if audio.ndim == 1:
            audio = audio[None]
        if audio.ndim == 3:  # (B, C, T) -> mono
            audio = audio.mean(axis=1)
        if self.sr != self.target_sr:
            from ezaudio_tpu.audio.signal import _resample

            audio = jnp.asarray(_resample(
                np.asarray(audio, np.float32)[:, None, :],
                self.sr, self.target_sr)[:, 0, :])
        pad = (400 - 320) // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)))
        return self._fwd(self.params, audio)
