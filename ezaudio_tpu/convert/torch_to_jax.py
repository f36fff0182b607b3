"""One-way PyTorch -> JAX weight converters for the published checkpoints.

Covers the three EzAudio checkpoint formats (SURVEY.md §5 checkpoint notes):
  * DiT:        ``.pt`` with key ``'model'`` -> MaskDiT params
                (reference api/ezaudio.py:84);
  * VAE:        ``ckpts/vae/1m.pt`` with key ``'state_dict'`` and an
                ``autoencoder.`` prefix, weight-normed convs
                (stable_vae/__init__.py:14-40) -> AudioVAE params with
                weight norm FOLDED (w = g * v / ||v||);
  * ControlNet: ``.pt`` with key ``'model'`` -> DiTControlNet params.

Layout maps (torch -> ours):
  * Linear weight (out, in)            -> kernel (in, out)      [transpose]
  * Conv1d weight (out, in, k)         -> kernel (k, in, out)   [transpose 2,1,0]
  * ConvTranspose1d weight (in, out, k)-> kernel (k, in, out)   [transpose 2,0,1 + time flip]
  * LayerNorm/RMSNorm weight/bias      -> weight/bias           [direct]

All functions operate on numpy arrays (state dicts loaded with
``torch.load(map_location='cpu')`` then ``.numpy()``), so torch is only an
optional dependency of the conversion path, never of the runtime.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def linear(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def rmsnorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[f"{prefix}.weight"])}


def conv1d(sd, prefix, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def fold_weight_norm_conv(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm (dim=0) for Conv1d v (out, in, k), g (out,1,1)."""
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return (g.reshape(-1, 1, 1) / np.maximum(norm, 1e-12)) * v


def fold_weight_norm_conv_transpose(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm (dim=0) for ConvTranspose1d v (in, out, k)."""
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    return (g.reshape(-1, 1, 1) / np.maximum(norm, 1e-12)) * v


def wn_conv1d(sd, prefix, bias: bool = True) -> Dict[str, np.ndarray]:
    w = fold_weight_norm_conv(_np(sd[f"{prefix}.weight_v"]), _np(sd[f"{prefix}.weight_g"]))
    out = {"kernel": w.transpose(2, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def wn_conv_transpose1d(sd, prefix, bias: bool = True) -> Dict[str, np.ndarray]:
    w = fold_weight_norm_conv_transpose(
        _np(sd[f"{prefix}.weight_v"]), _np(sd[f"{prefix}.weight_g"]))
    # (in, out, k) -> (k, in, out) + time flip into correlation orientation
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def snake(sd, prefix) -> Dict[str, np.ndarray]:
    return {"alpha": _np(sd[f"{prefix}.alpha"]), "beta": _np(sd[f"{prefix}.beta"])}


# ---------------------------------------------------------------------------
# VAE (Oobleck): reference Sequential index layout -> our named modules
# ---------------------------------------------------------------------------

def _res_unit(sd, prefix) -> Dict[str, Any]:
    # ResidualUnit.layers = [Snake, WNConv(k7,dil), Snake, WNConv(k1)]
    return {
        "act1": snake(sd, f"{prefix}.layers.0"),
        "conv1": wn_conv1d(sd, f"{prefix}.layers.1"),
        "act2": snake(sd, f"{prefix}.layers.2"),
        "conv2": wn_conv1d(sd, f"{prefix}.layers.3"),
    }


def convert_vae_state_dict(sd: Dict[str, Any], num_blocks: int = 4) -> Dict[str, Any]:
    """Reference VAE state dict (``autoencoder.`` prefix already stripped)
    -> AudioVAE params (weight norm folded)."""
    enc: Dict[str, Any] = {"stem": wn_conv1d(sd, "encoder.layers.0")}
    for i in range(num_blocks):
        p = f"encoder.layers.{1 + i}.layers"
        enc[f"block{i}"] = {
            "res0": _res_unit(sd, f"{p}.0"),
            "res1": _res_unit(sd, f"{p}.1"),
            "res2": _res_unit(sd, f"{p}.2"),
            "act": snake(sd, f"{p}.3"),
            "down": wn_conv1d(sd, f"{p}.4"),
        }
    enc["act"] = snake(sd, f"encoder.layers.{1 + num_blocks}")
    enc["head"] = wn_conv1d(sd, f"encoder.layers.{2 + num_blocks}")

    dec: Dict[str, Any] = {"stem": wn_conv1d(sd, "decoder.layers.0")}
    for j in range(num_blocks):
        p = f"decoder.layers.{1 + j}.layers"
        dec[f"block{j}"] = {
            "act": snake(sd, f"{p}.0"),
            "up": wn_conv_transpose1d(sd, f"{p}.1"),
            "res0": _res_unit(sd, f"{p}.2"),
            "res1": _res_unit(sd, f"{p}.3"),
            "res2": _res_unit(sd, f"{p}.4"),
        }
    dec["act"] = snake(sd, f"decoder.layers.{1 + num_blocks}")
    dec["head"] = wn_conv1d(sd, f"decoder.layers.{2 + num_blocks}", bias=False)

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# MaskDiT / UDiT
# ---------------------------------------------------------------------------

def _norm(sd, prefix, kind: str):
    return layernorm(sd, prefix) if kind == "layernorm" else rmsnorm(sd, prefix)


def _attention(sd, prefix, qk_norm, norm_kind) -> Dict[str, Any]:
    out = {
        "to_q": linear(sd, f"{prefix}.to_q"),
        "to_k": linear(sd, f"{prefix}.to_k"),
        "to_v": linear(sd, f"{prefix}.to_v"),
        "proj": linear(sd, f"{prefix}.proj"),
    }
    if qk_norm is not None:
        out["norm_q"] = _norm(sd, f"{prefix}.norm_q", qk_norm)
        out["norm_k"] = _norm(sd, f"{prefix}.norm_k", qk_norm)
    return out


def _dit_block(sd, prefix, cfg) -> Dict[str, Any]:
    qk_norm = cfg.get("qk_norm")
    norm_kind = cfg.get("norm_layer", "layernorm")
    time_fusion = cfg.get("time_fusion", "token")
    cross = cfg.get("context_fusion") == "cross" and cfg.get("context_dim") is not None

    out: Dict[str, Any] = {
        "norm1": _norm(sd, f"{prefix}.norm1", norm_kind),
        "norm3": _norm(sd, f"{prefix}.norm3", norm_kind),
        "attn": _attention(sd, f"{prefix}.attn", qk_norm, norm_kind),
        "mlp": {
            "proj_in": linear(sd, f"{prefix}.mlp.net.0.proj"),
            "proj_out": linear(sd, f"{prefix}.mlp.net.2"),
        },
    }
    if cross:
        out["norm2"] = _norm(sd, f"{prefix}.norm2", norm_kind)
        out["cross_attn"] = _attention(sd, f"{prefix}.cross_attn", qk_norm, norm_kind)
        if cfg.get("context_norm"):
            out["norm_context"] = _norm(sd, f"{prefix}.norm_context", norm_kind)

    if time_fusion != "token":
        ada: Dict[str, Any] = {}
        if time_fusion == "ada":
            ada["time_ada"] = linear(sd, f"{prefix}.adaln.time_ada")
        if time_fusion in ("ada_sola", "ada_sola_bias"):
            ada["lora_a"] = linear(sd, f"{prefix}.adaln.lora_a", bias=False)
            ada["lora_b"] = linear(sd, f"{prefix}.adaln.lora_b", bias=False)
        if time_fusion in ("ada_single", "ada_sola_bias"):
            ada["scale_shift_table"] = _np(sd[f"{prefix}.adaln.scale_shift_table"])
        out["adaln"] = ada

    if f"{prefix}.skip_linear.weight" in sd:
        fusion: Dict[str, Any] = {"skip_linear": linear(sd, f"{prefix}.skip_linear")}
        if f"{prefix}.skip_norm.weight" in sd:
            fusion["skip_norm"] = _norm(sd, f"{prefix}.skip_norm", norm_kind)
        out["skip_fusion"] = fusion
    return out


def _patch_embed(sd, prefix) -> Dict[str, np.ndarray]:
    # torch Conv1d (D, C, p) -> our per-patch linear (p*C, D):
    # kernel[(t*C + c), d] = w[d, c, t]
    w = _np(sd[f"{prefix}.proj.weight"])
    D, C, p = w.shape
    kernel = w.transpose(2, 1, 0).reshape(p * C, D)
    return {"kernel": kernel, "bias": _np(sd[f"{prefix}.proj.bias"])}


def _mlp_embedder(sd, prefix) -> Dict[str, Any]:
    return {"fc1": linear(sd, f"{prefix}.0"), "fc2": linear(sd, f"{prefix}.2")}


def convert_udit_state_dict(sd: Dict[str, Any], cfg: dict, prefix: str = "") -> Dict[str, Any]:
    """Torch UDiT state dict -> our UDiT params.  ``cfg`` is the ``model:``
    config block (determines which submodules exist)."""
    p = prefix
    depth = cfg["depth"]
    half = depth // 2
    out: Dict[str, Any] = {
        "patch_embed": _patch_embed(sd, f"{p}patch_embed"),
        "time_embed": {
            "fc1": linear(sd, f"{p}time_embed.mlp.0"),
            "fc2": linear(sd, f"{p}time_embed.mlp.2"),
        },
    }
    if cfg.get("pe_method", "none") == "abs":
        out["x_pe"] = {"abs_pe": _np(sd[f"{p}x_pe.abs_pe"])}
    if cfg.get("context_dim") is not None:
        out["context_embed"] = _mlp_embedder(sd, f"{p}context_embed")
    if cfg.get("time_fusion", "token") != "token":
        out["time_ada_final"] = linear(sd, f"{p}time_ada_final")
        if cfg["time_fusion"] in ("ada_single", "ada_sola", "ada_sola_bias"):
            out["time_ada"] = linear(sd, f"{p}time_ada")
    if cfg.get("cls_dim") is not None:
        out["cls_embed"] = _mlp_embedder(sd, f"{p}cls_embed")

    for i in range(half):
        out[f"in_blocks_{i}"] = _dit_block(sd, f"{p}in_blocks.{i}", cfg)
    out["mid_block"] = _dit_block(sd, f"{p}mid_block", cfg)
    for i in range(half):
        out[f"out_blocks_{i}"] = _dit_block(sd, f"{p}out_blocks.{i}", cfg)

    final: Dict[str, Any] = {
        "norm": _norm(sd, f"{p}final_block.norm", cfg.get("norm_layer", "layernorm")),
        "linear": linear(sd, f"{p}final_block.linear"),
    }
    if cfg.get("use_conv", True):
        final["final_conv"] = conv1d(sd, f"{p}final_block.final_layer")
    out["final_block"] = final
    return out


def convert_maskdit_state_dict(sd: Dict[str, Any], cfg: dict) -> Dict[str, Any]:
    """Torch MaskDiT state dict (ckpt['model']) -> our MaskDiT params."""
    out: Dict[str, Any] = {"model": convert_udit_state_dict(sd, cfg, prefix="model.")}
    if cfg.get("mae"):
        out["mask_embed"] = _np(sd["mask_embed"])
    return out


def load_torch_checkpoint(path: str, key: str | None = None) -> Dict[str, np.ndarray]:
    """Load a torch .pt file into a numpy state dict (host-side only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if key is not None:
        obj = obj[key]
    return {k: _np(v) for k, v in obj.items()}


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# ControlNet (reference src/models/controlnet.py state dict layout)
# ---------------------------------------------------------------------------

def convert_controlnet_state_dict(sd: Dict[str, Any], model_cfg: dict,
                                  controlnet_cfg: dict) -> Dict[str, Any]:
    """Torch DiTControlNet state dict (ckpt['model']) -> our params."""
    cfg = dict(model_cfg)
    half = cfg["depth"] // 2
    out: Dict[str, Any] = {
        "patch_embed": _patch_embed(sd, "patch_embed"),
        "time_embed": {
            "fc1": linear(sd, "time_embed.mlp.0"),
            "fc2": linear(sd, "time_embed.mlp.2"),
        },
    }
    if cfg.get("context_dim") is not None:
        out["context_embed"] = _mlp_embedder(sd, "context_embed")
    if cfg.get("time_fusion", "token") in ("ada_single", "ada_sola", "ada_sola_bias"):
        out["time_ada"] = linear(sd, "time_ada")
    for i in range(half):
        out[f"in_blocks_{i}"] = _dit_block(sd, f"in_blocks.{i}", cfg)
        out[f"zero_blocks_{i}"] = linear(sd, f"controlnet_zero_blocks.{i}")

    pre: Dict[str, Any] = {"conv_in": conv1d(sd, "controlnet_pre.conv_in"),
                           "conv_out": conv1d(sd, "controlnet_pre.conv_out")}
    if controlnet_cfg.get("cond_mask"):
        pre["mask_embed"] = _np(sd["controlnet_pre.mask_embed"])
    n_pyr = len(controlnet_cfg["cond_blocks"]) - 1
    for i in range(n_pyr):
        pre[f"pyramid{i}_conv1"] = conv1d(sd, f"controlnet_pre.blocks.{i}.0")
        pre[f"pyramid{i}_conv2"] = conv1d(sd, f"controlnet_pre.blocks.{i}.2")
    out["controlnet_pre"] = pre
    return out


# ---------------------------------------------------------------------------
# DAC codec (reference src/modules/dac/model/dac.py state dict layout)
# ---------------------------------------------------------------------------

def _dac_snake(sd, prefix) -> Dict[str, np.ndarray]:
    return {"alpha": _np(sd[f"{prefix}.alpha"]).reshape(-1)}


def _dac_res_unit(sd, prefix) -> Dict[str, Any]:
    # ResidualUnit.block = [Snake1d, WNConv(k7), Snake1d, WNConv(k1)]
    return {
        "act1": _dac_snake(sd, f"{prefix}.block.0"),
        "conv1": wn_conv1d(sd, f"{prefix}.block.1"),
        "act2": _dac_snake(sd, f"{prefix}.block.2"),
        "conv2": wn_conv1d(sd, f"{prefix}.block.3"),
    }


def convert_dac_state_dict(sd: Dict[str, Any], n_enc_blocks: int = 4,
                           n_dec_blocks: int = 4, n_codebooks: int = 9
                           ) -> Dict[str, Any]:
    """Torch DAC state dict -> our DAC params."""
    enc: Dict[str, Any] = {"stem": wn_conv1d(sd, "encoder.block.0")}
    for i in range(n_enc_blocks):
        p = f"encoder.block.{1 + i}.block"
        enc[f"block{i}"] = {
            "res0": _dac_res_unit(sd, f"{p}.0"),
            "res1": _dac_res_unit(sd, f"{p}.1"),
            "res2": _dac_res_unit(sd, f"{p}.2"),
            "act": _dac_snake(sd, f"{p}.3"),
            "down": wn_conv1d(sd, f"{p}.4"),
        }
    enc["act"] = _dac_snake(sd, f"encoder.block.{1 + n_enc_blocks}")
    enc["head"] = wn_conv1d(sd, f"encoder.block.{2 + n_enc_blocks}")

    dec: Dict[str, Any] = {"stem": wn_conv1d(sd, "decoder.model.0")}
    for i in range(n_dec_blocks):
        p = f"decoder.model.{1 + i}.block"
        dec[f"block{i}"] = {
            "act": _dac_snake(sd, f"{p}.0"),
            "up": wn_conv_transpose1d(sd, f"{p}.1"),
            "res0": _dac_res_unit(sd, f"{p}.2"),
            "res1": _dac_res_unit(sd, f"{p}.3"),
            "res2": _dac_res_unit(sd, f"{p}.4"),
        }
    dec["act"] = _dac_snake(sd, f"decoder.model.{1 + n_dec_blocks}")
    dec["head"] = wn_conv1d(sd, f"decoder.model.{2 + n_dec_blocks}")

    quant: Dict[str, Any] = {}
    for i in range(n_codebooks):
        p = f"quantizer.quantizers.{i}"
        quant[f"q{i}"] = {
            "in_proj": wn_conv1d(sd, f"{p}.in_proj"),
            "out_proj": wn_conv1d(sd, f"{p}.out_proj"),
            "codebook": _np(sd[f"{p}.codebook.weight"]),
        }

    return {"encoder": enc, "decoder": dec, "quantizer": quant}
