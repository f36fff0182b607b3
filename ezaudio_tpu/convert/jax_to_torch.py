"""JAX -> PyTorch export: the inverse of ``torch_to_jax`` for the DiT.

Models trained in this framework can be exported to the reference's
checkpoint format (``torch.save({'model': state_dict})``,
api/ezaudio.py:84), so reference users can consume them unchanged.
Round-trip exactness (torch -> jax -> torch identity) is tested against the
golden fixtures.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _lin(dst: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]):
    dst[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        dst[f"{prefix}.bias"] = np.asarray(p["bias"])


def _norm(dst, prefix, p):
    dst[f"{prefix}.weight"] = np.asarray(p["weight"])
    if "bias" in p:
        dst[f"{prefix}.bias"] = np.asarray(p["bias"])


def _attention(dst, prefix, p):
    for name in ("to_q", "to_k", "to_v", "proj"):
        _lin(dst, f"{prefix}.{name}", p[name])
    for name in ("norm_q", "norm_k"):
        if name in p:
            _norm(dst, f"{prefix}.{name}", p[name])


def _rotary_buffers(dst, prefix, cfg):
    """The reference's RotaryEmbedding registers inv_freq as a persistent
    buffer (rotary.py:41-43); emit it so strict load_state_dict works."""
    rope = cfg.get("rope_mode", "none")
    if rope == "none":
        return
    head_dim = cfg["embed_dim"] // cfg["num_heads"]
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2, dtype=np.float32)
                             / head_dim))
    if rope in ("shared", "x_only"):
        dst[f"{prefix}.attn.rotary.inv_freq"] = inv
    elif rope == "dual":
        dst[f"{prefix}.attn.rotary_x.inv_freq"] = inv
        dst[f"{prefix}.attn.rotary_c.inv_freq"] = inv


def _block(dst, prefix, p):
    _norm(dst, f"{prefix}.norm1", p["norm1"])
    _norm(dst, f"{prefix}.norm3", p["norm3"])
    _attention(dst, f"{prefix}.attn", p["attn"])
    _lin(dst, f"{prefix}.mlp.net.0.proj", p["mlp"]["proj_in"])
    _lin(dst, f"{prefix}.mlp.net.2", p["mlp"]["proj_out"])
    if "cross_attn" in p:
        _norm(dst, f"{prefix}.norm2", p["norm2"])
        _attention(dst, f"{prefix}.cross_attn", p["cross_attn"])
    if "norm_context" in p:
        _norm(dst, f"{prefix}.norm_context", p["norm_context"])
    if "adaln" in p:
        a = p["adaln"]
        if "time_ada" in a:
            _lin(dst, f"{prefix}.adaln.time_ada", a["time_ada"])
        if "lora_a" in a:
            _lin(dst, f"{prefix}.adaln.lora_a", a["lora_a"])
            _lin(dst, f"{prefix}.adaln.lora_b", a["lora_b"])
        if "scale_shift_table" in a:
            dst[f"{prefix}.adaln.scale_shift_table"] = np.asarray(
                a["scale_shift_table"])
    if "skip_fusion" in p:
        sf = p["skip_fusion"]
        _lin(dst, f"{prefix}.skip_linear", sf["skip_linear"])
        if "skip_norm" in sf:
            _norm(dst, f"{prefix}.skip_norm", sf["skip_norm"])


def export_maskdit_state_dict(params: Dict[str, Any], cfg: dict
                              ) -> Dict[str, np.ndarray]:
    """MaskDiT params tree ({'mask_embed', 'model': {...}}) -> torch-layout
    flat state dict (reference naming, ``model.`` prefix)."""
    sd: Dict[str, np.ndarray] = {}
    if "mask_embed" in params:
        sd["mask_embed"] = np.asarray(params["mask_embed"])
    m = params["model"]
    depth = cfg["depth"]
    half = depth // 2

    # patch embed: (p*C, D) -> torch conv (D, C, p)
    pe = m["patch_embed"]
    p_size = cfg.get("patch_size", 1)
    in_ch = cfg["in_chans"]
    k = np.asarray(pe["kernel"]).reshape(p_size, in_ch, -1).transpose(2, 1, 0)
    sd["model.patch_embed.proj.weight"] = np.ascontiguousarray(k)
    sd["model.patch_embed.proj.bias"] = np.asarray(pe["bias"])

    _lin(sd, "model.time_embed.mlp.0", m["time_embed"]["fc1"])
    _lin(sd, "model.time_embed.mlp.2", m["time_embed"]["fc2"])
    if "x_pe" in m and "abs_pe" in m["x_pe"]:
        sd["model.x_pe.abs_pe"] = np.asarray(m["x_pe"]["abs_pe"])
    if "context_embed" in m:
        _lin(sd, "model.context_embed.0", m["context_embed"]["fc1"])
        _lin(sd, "model.context_embed.2", m["context_embed"]["fc2"])
    if "time_ada_final" in m:
        _lin(sd, "model.time_ada_final", m["time_ada_final"])
    if "time_ada" in m:
        _lin(sd, "model.time_ada", m["time_ada"])
    if "cls_embed" in m:
        _lin(sd, "model.cls_embed.0", m["cls_embed"]["fc1"])
        _lin(sd, "model.cls_embed.2", m["cls_embed"]["fc2"])

    for i in range(half):
        _block(sd, f"model.in_blocks.{i}", m[f"in_blocks_{i}"])
        _rotary_buffers(sd, f"model.in_blocks.{i}", cfg)
    _block(sd, "model.mid_block", m["mid_block"])
    _rotary_buffers(sd, "model.mid_block", cfg)
    for i in range(half):
        _block(sd, f"model.out_blocks.{i}", m[f"out_blocks_{i}"])
        _rotary_buffers(sd, f"model.out_blocks.{i}", cfg)

    fb = m["final_block"]
    _norm(sd, "model.final_block.norm", fb["norm"])
    _lin(sd, "model.final_block.linear", fb["linear"])
    if "final_conv" in fb:
        sd["model.final_block.final_layer.weight"] = np.ascontiguousarray(
            np.asarray(fb["final_conv"]["kernel"]).transpose(2, 1, 0))
        sd["model.final_block.final_layer.bias"] = np.asarray(
            fb["final_conv"]["bias"])
    return sd


def save_reference_checkpoint(path: str, params: Dict[str, Any], cfg: dict):
    """Write a reference-format .pt: torch.save({'model': state_dict})."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_maskdit_state_dict(params, cfg).items()}
    torch.save({"model": sd}, path)
    return path


def export_controlnet_state_dict(params: Dict[str, Any], model_cfg: dict,
                                 controlnet_cfg: dict) -> Dict[str, np.ndarray]:
    """DiTControlNet params -> torch-layout state dict (reference naming)."""
    sd: Dict[str, np.ndarray] = {}
    cfg = dict(model_cfg)
    half = cfg["depth"] // 2

    pe = params["patch_embed"]
    p_size = cfg.get("patch_size", 1)
    in_ch = cfg["in_chans"]
    k = np.asarray(pe["kernel"]).reshape(p_size, in_ch, -1).transpose(2, 1, 0)
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(k)
    sd["patch_embed.proj.bias"] = np.asarray(pe["bias"])
    _lin(sd, "time_embed.mlp.0", params["time_embed"]["fc1"])
    _lin(sd, "time_embed.mlp.2", params["time_embed"]["fc2"])
    if "context_embed" in params:
        _lin(sd, "context_embed.0", params["context_embed"]["fc1"])
        _lin(sd, "context_embed.2", params["context_embed"]["fc2"])
    if "time_ada" in params:
        _lin(sd, "time_ada", params["time_ada"])

    for i in range(half):
        _block(sd, f"in_blocks.{i}", params[f"in_blocks_{i}"])
        _rotary_buffers(sd, f"in_blocks.{i}", cfg)
        _lin(sd, f"controlnet_zero_blocks.{i}", params[f"zero_blocks_{i}"])

    pre = params["controlnet_pre"]

    def conv(dst_name, p):
        sd[f"{dst_name}.weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).transpose(2, 1, 0))
        if "bias" in p:
            sd[f"{dst_name}.bias"] = np.asarray(p["bias"])

    conv("controlnet_pre.conv_in", pre["conv_in"])
    conv("controlnet_pre.conv_out", pre["conv_out"])
    if "mask_embed" in pre:
        sd["controlnet_pre.mask_embed"] = np.asarray(pre["mask_embed"])
    n_pyr = len(controlnet_cfg["cond_blocks"]) - 1
    for i in range(n_pyr):
        conv(f"controlnet_pre.blocks.{i}.0", pre[f"pyramid{i}_conv1"])
        conv(f"controlnet_pre.blocks.{i}.2", pre[f"pyramid{i}_conv2"])
    return sd
