"""Native flax CLAP — contrastive language-audio embeddings.

The reference reserves a CLAP seam (`/root/reference/src/modules/
clap_wrapper.py` is an empty placeholder) and the EzAudio paper's headline
quality metrics include the CLAP score.  This module implements the
LAION-CLAP architecture (the `laion/clap-htsat-unfused` family served by
`transformers.ClapModel`) from scratch in flax, same pattern as the T5
(`text/t5.py`) and HuBERT (`models/hubert.py`) ports:

* text tower — RoBERTa encoder (post-LN BERT blocks, cumsum position ids
  offset by the pad id) + tanh CLS pooler,
* audio tower — HTSAT: a Swin transformer over the log-mel spectrogram
  reshaped to a square "image" (windowed attention with relative position
  bias, shifted windows with the precomputed -100 additive mask, patch
  merging between stages), BatchNorm over mel bins in front,
* two-layer MLP projections to the shared space + learned logit scales,
* a state-dict converter from the `transformers` checkpoint format, so the
  published weights are one local file away.

TPU notes: every shape is static — window partitioning, the shifted-window
attention mask, the relative-position-bias gather index, and the
align-corners bicubic time interpolation are all precomputed on host as
numpy constants and folded into the jitted graph; attention runs on the
same einsum path as the DiT.  Window attention at window 8 gives 64-token
tiles — small, but they batch over (windows x heads) so the MXU stays fed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Configs (mirror transformers' ClapTextConfig / ClapAudioConfig)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512

    @classmethod
    def from_hf_config(cls, hf) -> "ClapTextConfig":
        return cls(
            vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            max_position_embeddings=hf.max_position_embeddings,
            type_vocab_size=hf.type_vocab_size,
            pad_token_id=hf.pad_token_id, layer_norm_eps=hf.layer_norm_eps,
            projection_dim=hf.projection_dim)


@dataclasses.dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    num_mel_bins: int = 64
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    patch_embeds_hidden_size: int = 96
    window_size: int = 8
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_attention_heads: Tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    hidden_size: int = 768          # = patch_embeds_hidden_size * 2**(n-1)
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512
    flatten_patch_embeds: bool = True
    enable_patch_layer_norm: bool = True

    @classmethod
    def from_hf_config(cls, hf) -> "ClapAudioConfig":
        return cls(
            spec_size=hf.spec_size, num_mel_bins=hf.num_mel_bins,
            patch_size=hf.patch_size, patch_stride=tuple(hf.patch_stride),
            patch_embeds_hidden_size=hf.patch_embeds_hidden_size,
            window_size=hf.window_size, depths=tuple(hf.depths),
            num_attention_heads=tuple(hf.num_attention_heads),
            mlp_ratio=hf.mlp_ratio, qkv_bias=hf.qkv_bias,
            hidden_size=hf.hidden_size, layer_norm_eps=hf.layer_norm_eps,
            projection_dim=hf.projection_dim,
            flatten_patch_embeds=hf.flatten_patch_embeds,
            enable_patch_layer_norm=hf.enable_patch_layer_norm)

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.spec_size // self.patch_stride[0],
                self.spec_size // self.patch_stride[1])


# ---------------------------------------------------------------------------
# Host-side static helpers
# ---------------------------------------------------------------------------

def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch bicubic's A=-0.75) at |t|<=2."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0))
    return w


def bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) interpolation matrix reproducing
    ``torch.nn.functional.interpolate(mode='bicubic', align_corners=True)``
    along one axis (edge taps clamped).  Identity when src == dst."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    x = np.arange(dst) * (src - 1) / (dst - 1)
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    mat = np.zeros((dst, src), np.float64)
    for off, dist in ((-1, t + 1.0), (0, t), (1, 1.0 - t), (2, 2.0 - t)):
        idx = np.clip(x0 + off, 0, src - 1)
        np.add.at(mat, (np.arange(dst), idx), _cubic_kernel(dist))
    return mat.astype(np.float32)


def swin_relative_index(window: int) -> np.ndarray:
    """(w*w, w*w) gather index into the (2w-1)^2 relative-position-bias
    table (HF modeling_clap.py ClapAudioSelfAttention.__init__)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, w2, w2)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def swin_shift_mask(height: int, width: int, window: int,
                    shift: int) -> Optional[np.ndarray]:
    """(num_windows, w*w, w*w) additive mask (0 / -100) for shifted-window
    attention, or None when shift == 0."""
    if shift == 0:
        return None
    img = np.zeros((height, width), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(height // window, window, width // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(x: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, w*w, C) -> (B, H, W, C)."""
    C = x.shape[-1]
    x = x.reshape(-1, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


# ---------------------------------------------------------------------------
# Audio tower (HTSAT Swin)
# ---------------------------------------------------------------------------

class SwinWindowAttention(nn.Module):
    """Windowed MHSA with a learned relative position bias
    (modeling_clap.py ClapAudioSelfAttention + SelfOutput)."""
    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[np.ndarray]) -> jnp.ndarray:
        nB, N, _ = x.shape          # nB = batch * windows, N = window**2
        h, d = self.num_heads, self.dim // self.num_heads
        dense = lambda name: nn.Dense(self.dim, use_bias=self.qkv_bias,
                                      dtype=self.dtype, name=name)
        q = dense("query")(x).reshape(nB, N, h, d)
        k = dense("key")(x).reshape(nB, N, h, d)
        v = dense("value")(x).reshape(nB, N, h, d)

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.num_heads))
        idx = swin_relative_index(self.window)
        bias = table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        bias = bias.transpose(2, 0, 1)                       # (h, N, N)

        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d)
        scores = scores + bias[None].astype(scores.dtype)
        if mask is not None:
            nW = mask.shape[0]
            scores = scores.reshape(nB // nW, nW, h, N, N)
            scores = scores + jnp.asarray(mask)[None, :, None].astype(
                scores.dtype)
            scores = scores.reshape(nB, h, N, N)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(nB, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One Swin layer: LN -> (shifted-)window attention -> residual ->
    LN -> MLP -> residual (modeling_clap.py ClapAudioLayer)."""
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        # HF set_shift_and_window_size: shrink to the resolution when the
        # window doesn't fit; then shift vanishes.  Static per stage.
        window = self.window_size
        shift = self.shift_size
        if min(H, W) <= window:
            window, shift = min(H, W), 0

        B, N, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="norm_before")(x)
        x = x.reshape(B, H, W, C)
        pad_b = (window - H % window) % window
        pad_r = (window - W % window) % window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = swin_shift_mask(Hp, Wp, window, shift)
        x = _window_partition(x, window)
        x = SwinWindowAttention(self.dim, self.num_heads, window,
                                self.qkv_bias, dtype=self.dtype,
                                name="attention")(x, mask)
        x = _window_reverse(x, window, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W].reshape(B, N, C)
        x = shortcut + x

        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="norm_after")(x)
        y = nn.Dense(int(self.mlp_ratio * self.dim), dtype=self.dtype,
                     name="mlp_in")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 patch merging: 4-way stride slice, LN(4C), Linear(4C->2C, no
    bias) (modeling_clap.py ClapAudioPatchMerging)."""
    dim: int
    resolution: Tuple[int, int]
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        B, _, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class ClapAudioTower(nn.Module):
    """HTSAT audio encoder (modeling_clap.py ClapAudioEncoder): BatchNorm
    over mel bins -> mel->img reshape (with align-corners bicubic time
    interpolation) -> conv patch embed -> Swin stages -> LN -> mean pool.

    Input ``input_features``: (B, 1, T_frames, num_mel_bins) log-mel, with
    T_frames <= spec_size * freq_ratio.  Returns (framewise, pooled):
    framewise (B, tokens, hidden_size) normed last hidden state, pooled
    (B, hidden_size).
    """
    cfg: ClapAudioConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: jnp.ndarray):
        cfg = self.cfg
        B, _, T, F = input_features.shape
        # --- frozen BatchNorm2d over the mel-bin channel (inference form;
        # running stats live in the param tree via the converter)
        bn_scale = self.param("bn_scale", nn.initializers.ones, (F,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (F,))
        bn_mean = self.param("bn_mean", nn.initializers.zeros, (F,))
        bn_var = self.param("bn_var", nn.initializers.ones, (F,))
        x = (input_features - bn_mean) * jax.lax.rsqrt(bn_var + 1e-5)
        x = x * bn_scale + bn_bias

        # --- reshape_mel2img: interpolate time to spec_size*freq_ratio
        # (bicubic align_corners, precomputed matrix), then fold freq_ratio
        # time-chunks into the frequency axis -> (B, 1, S, S) image
        r = cfg.freq_ratio
        spec_w, spec_h = cfg.spec_size * r, cfg.spec_size // r
        if T > spec_w or F > spec_h:
            raise ValueError(f"mel input ({T}x{F}) exceeds swin input "
                             f"({spec_w}x{spec_h})")
        if T < spec_w:
            x = jnp.einsum("st,bctf->bcsf", jnp.asarray(bicubic_matrix(
                T, spec_w), x.dtype), x)
        if F < spec_h:
            x = jnp.einsum("sf,bctf->bcts", jnp.asarray(bicubic_matrix(
                F, spec_h), x.dtype), x)
        x = x.reshape(B, r, spec_w // r, spec_h)
        x = x.transpose(0, 1, 3, 2).reshape(B, 1, spec_h * r, spec_w // r)

        # --- patch embed: Conv(k=patch, s=stride) + LN, channel-last
        x = x.transpose(0, 2, 3, 1)                         # (B, S, S, 1)
        x = nn.Conv(cfg.patch_embeds_hidden_size,
                    (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_stride, padding="VALID",
                    dtype=self.dtype, name="patch_proj")(x)
        gh, gw = cfg.grid_size
        x = x.reshape(B, gh * gw, cfg.patch_embeds_hidden_size)
        if cfg.enable_patch_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="patch_norm")(x)

        # --- Swin stages
        n_stages = len(cfg.depths)
        res = [(gh // 2 ** i, gw // 2 ** i) for i in range(n_stages)]
        for i in range(n_stages):
            dim = cfg.patch_embeds_hidden_size * 2 ** i
            for j in range(cfg.depths[i]):
                x = SwinBlock(
                    dim=dim, num_heads=cfg.num_attention_heads[i],
                    resolution=res[i], window_size=cfg.window_size,
                    shift_size=0 if j % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    eps=cfg.layer_norm_eps, dtype=self.dtype,
                    name=f"stage_{i}_block_{j}")(x)
            if i < n_stages - 1:
                x = PatchMerging(dim=dim, resolution=res[i],
                                 eps=cfg.layer_norm_eps, dtype=self.dtype,
                                 name=f"stage_{i}_downsample")(x)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm")(x)
        # HF reshapes through a grouped-2D layout before AdaptiveAvgPool1d;
        # the pool averages every spatial position, so it reduces to a
        # token mean.
        pooled = x.mean(axis=1)
        return x, pooled


# ---------------------------------------------------------------------------
# Text tower (RoBERTa)
# ---------------------------------------------------------------------------

class ClapTextTower(nn.Module):
    """RoBERTa encoder + tanh CLS pooler (modeling_clap.py ClapTextModel).

    ``input_ids`` (B, L) int32, ``attention_mask`` (B, L) {0,1}.  Returns
    (last_hidden_state, pooled).
    """
    cfg: ClapTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        attention_mask = attention_mask.astype(jnp.int32)

        # RoBERTa position ids: positions count non-pad tokens, offset by
        # the pad id; pads keep position pad_id (create_position_ids_...)
        pos = jnp.cumsum(attention_mask, axis=1) * attention_mask \
            + cfg.pad_token_id

        embed = lambda n, c: nn.Embed(c, cfg.hidden_size, dtype=self.dtype,
                                      name=n)
        x = embed("word_embeddings", cfg.vocab_size)(input_ids)
        x = x + embed("position_embeddings",
                      cfg.max_position_embeddings)(pos)
        x = x + embed("token_type_embeddings", cfg.type_vocab_size)(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embed_norm")(x)

        neg = jnp.finfo(jnp.float32).min
        addmask = (1.0 - attention_mask[:, None, None, :]) * neg

        h, d = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
        for i in range(cfg.num_hidden_layers):
            name = f"layer_{i}"
            dense = lambda n, dim=cfg.hidden_size: nn.Dense(
                dim, dtype=self.dtype, name=f"{name}_{n}")
            q = dense("query")(x).reshape(B, L, h, d)
            k = dense("key")(x).reshape(B, L, h, d)
            v = dense("value")(x).reshape(B, L, h, d)
            scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(d)
            scores = scores + addmask.astype(scores.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(
                B, L, cfg.hidden_size)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name=f"{name}_attn_norm")(
                dense("attn_out")(attn) + x)
            y = dense("mlp_in", cfg.intermediate_size)(x)
            y = jax.nn.gelu(y, approximate=False)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name=f"{name}_mlp_norm")(
                dense("mlp_out")(y) + x)

        pooled = jnp.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                   name="pooler")(x[:, 0]))
        return x, pooled


class ClapProjection(nn.Module):
    """Linear -> ReLU -> Linear into the shared embedding space
    (modeling_clap.py ClapProjectionLayer)."""
    projection_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.projection_dim, dtype=self.dtype,
                     name="linear1")(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.projection_dim, dtype=self.dtype,
                        name="linear2")(x)


# ---------------------------------------------------------------------------
# The combined model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ClapConfig:
    text: ClapTextConfig = ClapTextConfig()
    audio: ClapAudioConfig = ClapAudioConfig()
    projection_dim: int = 512
    logit_scale_init: float = math.log(100 / 7)

    @classmethod
    def from_hf_config(cls, hf) -> "ClapConfig":
        return cls(text=ClapTextConfig.from_hf_config(hf.text_config),
                   audio=ClapAudioConfig.from_hf_config(hf.audio_config),
                   projection_dim=hf.projection_dim,
                   logit_scale_init=math.log(hf.logit_scale_init_value))


class CLAP(nn.Module):
    """Both towers + projections + logit scales.  Call with either or both
    modalities; returns a dict with l2-normalized ``audio_embeds`` /
    ``text_embeds`` and similarity logits when both are given."""
    cfg: ClapConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: Optional[jnp.ndarray] = None,
                 input_ids: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        scale_a = self.param("logit_scale_a",
                             nn.initializers.constant(
                                 self.cfg.logit_scale_init), ())
        scale_t = self.param("logit_scale_t",
                             nn.initializers.constant(
                                 self.cfg.logit_scale_init), ())
        if input_features is not None:
            _, pooled = ClapAudioTower(self.cfg.audio, dtype=self.dtype,
                                       name="audio_tower")(input_features)
            emb = ClapProjection(self.cfg.projection_dim, dtype=self.dtype,
                                 name="audio_projection")(pooled)
            out["audio_embeds"] = emb / jnp.linalg.norm(
                emb, axis=-1, keepdims=True)
        if input_ids is not None:
            _, pooled = ClapTextTower(self.cfg.text, dtype=self.dtype,
                                      name="text_tower")(
                input_ids, attention_mask)
            emb = ClapProjection(self.cfg.projection_dim, dtype=self.dtype,
                                 name="text_projection")(pooled)
            out["text_embeds"] = emb / jnp.linalg.norm(
                emb, axis=-1, keepdims=True)
        if "audio_embeds" in out and "text_embeds" in out:
            out["logits_per_audio"] = jnp.exp(scale_a) * (
                out["audio_embeds"] @ out["text_embeds"].T)
            out["logits_per_text"] = jnp.exp(scale_t) * (
                out["text_embeds"] @ out["audio_embeds"].T)
        return out


# ---------------------------------------------------------------------------
# transformers ClapModel state_dict -> flax params
# ---------------------------------------------------------------------------

def convert_clap_state_dict(sd: Dict[str, Any],
                            cfg: ClapConfig) -> Dict[str, Any]:
    """Map ``transformers.ClapModel.state_dict()`` (or a torch.load of the
    published checkpoint) onto :class:`CLAP` params."""
    sd = {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v, np.float32)
          for k, v in sd.items()}

    def lin(key):
        out = {"kernel": jnp.asarray(sd[f"{key}.weight"].T)}
        if f"{key}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{key}.bias"])
        return out

    def ln(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    def proj(key):
        return {"linear1": lin(f"{key}.linear1"),
                "linear2": lin(f"{key}.linear2")}

    # ---- audio tower
    enc = "audio_model.audio_encoder"
    at: Dict[str, Any] = {
        "bn_scale": jnp.asarray(sd[f"{enc}.batch_norm.weight"]),
        "bn_bias": jnp.asarray(sd[f"{enc}.batch_norm.bias"]),
        "bn_mean": jnp.asarray(sd[f"{enc}.batch_norm.running_mean"]),
        "bn_var": jnp.asarray(sd[f"{enc}.batch_norm.running_var"]),
        "patch_proj": {
            # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": jnp.asarray(
                sd[f"{enc}.patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd[f"{enc}.patch_embed.proj.bias"]),
        },
        "norm": ln(f"{enc}.norm"),
    }
    if cfg.audio.enable_patch_layer_norm:
        at["patch_norm"] = ln(f"{enc}.patch_embed.norm")
    for i in range(len(cfg.audio.depths)):
        for j in range(cfg.audio.depths[i]):
            base = f"{enc}.layers.{i}.blocks.{j}"
            at[f"stage_{i}_block_{j}"] = {
                "norm_before": ln(f"{base}.layernorm_before"),
                "norm_after": ln(f"{base}.layernorm_after"),
                "attention": {
                    "query": lin(f"{base}.attention.self.query"),
                    "key": lin(f"{base}.attention.self.key"),
                    "value": lin(f"{base}.attention.self.value"),
                    "proj": lin(f"{base}.attention.output.dense"),
                    "relative_position_bias_table": jnp.asarray(
                        sd[f"{base}.attention.self."
                           f"relative_position_bias_table"]),
                },
                "mlp_in": lin(f"{base}.intermediate.dense"),
                "mlp_out": lin(f"{base}.output.dense"),
            }
        if i < len(cfg.audio.depths) - 1:
            base = f"{enc}.layers.{i}.downsample"
            at[f"stage_{i}_downsample"] = {
                "norm": ln(f"{base}.norm"),
                "reduction": lin(f"{base}.reduction"),
            }

    # ---- text tower
    emb = "text_model.embeddings"
    tt: Dict[str, Any] = {
        "word_embeddings": {"embedding": jnp.asarray(
            sd[f"{emb}.word_embeddings.weight"])},
        "position_embeddings": {"embedding": jnp.asarray(
            sd[f"{emb}.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": jnp.asarray(
            sd[f"{emb}.token_type_embeddings.weight"])},
        "embed_norm": ln(f"{emb}.LayerNorm"),
        "pooler": lin("text_model.pooler.dense"),
    }
    for i in range(cfg.text.num_hidden_layers):
        base = f"text_model.encoder.layer.{i}"
        tt[f"layer_{i}_query"] = lin(f"{base}.attention.self.query")
        tt[f"layer_{i}_key"] = lin(f"{base}.attention.self.key")
        tt[f"layer_{i}_value"] = lin(f"{base}.attention.self.value")
        tt[f"layer_{i}_attn_out"] = lin(f"{base}.attention.output.dense")
        tt[f"layer_{i}_attn_norm"] = ln(f"{base}.attention.output.LayerNorm")
        tt[f"layer_{i}_mlp_in"] = lin(f"{base}.intermediate.dense")
        tt[f"layer_{i}_mlp_out"] = lin(f"{base}.output.dense")
        tt[f"layer_{i}_mlp_norm"] = ln(f"{base}.output.LayerNorm")

    return {
        "logit_scale_a": jnp.asarray(sd["logit_scale_a"]),
        "logit_scale_t": jnp.asarray(sd["logit_scale_t"]),
        "audio_tower": at,
        "text_tower": tt,
        "audio_projection": proj("audio_projection"),
        "text_projection": proj("text_projection"),
    }
