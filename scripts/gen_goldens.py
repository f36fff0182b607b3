"""Generate golden parity fixtures from the PyTorch reference.

Runs the *reference implementation* (mounted read-only at /root/reference)
on tiny randomly-initialized configs and saves state dicts + inputs +
outputs to ``tests/fixtures/*.npz``.  Tests then verify that our JAX modules
+ the torch->jax converter reproduce those outputs bit-closely WITHOUT ever
importing the reference at test time (fixtures are committed).

Usage:  python scripts/gen_goldens.py
"""

import os
import sys
import types

import numpy as np
import torch

REF = os.environ.get("EZAUDIO_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)


def _stub_missing_modules():
    """The reference imports some packages absent from this image; stub the
    symbols that the EzAudio configuration never actually executes."""
    stubs = {
        "alias_free_torch": {"Activation1d": object},
        "vector_quantize_pytorch": {"ResidualVQ": object, "FSQ": object},
        "audiotools": {"AudioSignal": object, "STFTParams": object},
        "librosa": {},
        "soundfile": {},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
    try:
        import torchaudio  # noqa: F401
    except ImportError:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")
        tr.Resample = object
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr


def state_dict_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def gen_vae():
    sys.path.insert(0, os.path.join(REF, "src", "modules"))
    from stable_vae.models.autoencoders import OobleckDecoder, OobleckEncoder

    torch.manual_seed(0)
    cfg = dict(channels=8, c_mults=[1, 2], strides=[2, 4], use_snake=True)
    enc = OobleckEncoder(in_channels=1, latent_dim=8, **cfg).eval()
    dec = OobleckDecoder(out_channels=1, latent_dim=4, final_tanh=False, **cfg).eval()
    # randomize snake params away from init-zeros and g away from ||v||
    with torch.no_grad():
        for m in [enc, dec]:
            for n, p in m.named_parameters():
                if n.endswith("alpha") or n.endswith("beta") or "weight_g" in n:
                    p.add_(0.3 * torch.randn_like(p))

    x = torch.randn(2, 1, 64)
    with torch.no_grad():
        mean_scale = enc(x)
        wav = dec(mean_scale[:, :4])

    data = {"x": x.numpy(), "mean_scale": mean_scale.numpy(), "wav": wav.numpy()}
    for k, v in state_dict_np(enc).items():
        data[f"enc.{k}"] = v
    for k, v in state_dict_np(dec).items():
        data[f"dec.{k}"] = v
    np.savez(os.path.join(OUT, "vae_tiny.npz"), **data)
    print("vae_tiny.npz written", wav.shape)


TINY_DIT_CFG = dict(
    mae=True, mae_prob=0.25, mask_ratio=[0.25, 1.0], mask_span=4,
    img_size=32, patch_size=1, in_chans=17, out_chans=8, input_type="1d",
    embed_dim=64, depth=4, num_heads=4, mlp_ratio=2.0,
    qkv_bias=False, qk_scale=None, qk_norm="layernorm",
    norm_layer="layernorm", act_layer="geglu", context_norm=True,
    use_checkpoint=False, time_fusion="ada_sola_bias",
    ada_sola_rank=8, ada_sola_alpha=8, cls_dim=None,
    context_dim=24, context_fusion="cross", context_max_length=None,
    context_pe_method="none", pe_method="none", rope_mode="shared",
    use_conv=True, skip=True, skip_norm=True,
)


def gen_maskdit():
    sys.path.insert(0, os.path.join(REF, "src"))
    from models.conditioners import MaskDiT

    torch.manual_seed(0)
    model = MaskDiT(**TINY_DIT_CFG).eval()
    # push zero-inited heads off zero so parity is meaningful
    with torch.no_grad():
        for n, p in model.named_parameters():
            if p.abs().max() < 1e-8:
                p.add_(0.05 * torch.randn_like(p))

    B, L, C = 2, 32, 8
    x = torch.randn(B, C, L)
    ctx = torch.randn(B, 5, 24)
    cmask = torch.tensor([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=torch.bool)
    t = torch.tensor([10, 500])

    with torch.no_grad():
        out_gen, _ = model(x, t, ctx, context_mask=cmask, gt=None, mae_mask_infer=None)
        gt = torch.randn(B, C, L)
        gmask = torch.zeros(B, 1, L, dtype=torch.bool)
        gmask[:, :, 8:16] = True
        out_edit, _ = model(x, t, ctx, context_mask=cmask, gt=gt.clone(),
                            mae_mask_infer=gmask.expand(B, C, L))
        concat, _ = model(x, t, ctx, context_mask=cmask, forward_model=False)

    data = {
        "x": x.numpy(), "ctx": ctx.numpy(), "cmask": cmask.numpy(),
        "t": t.numpy(), "gt": gt.numpy(), "gmask": gmask.numpy(),
        "out_gen": out_gen.numpy(), "out_edit": out_edit.numpy(),
        "concat": concat.numpy(),
    }
    for k, v in state_dict_np(model).items():
        data[f"sd.{k}"] = v
    np.savez(os.path.join(OUT, "maskdit_tiny.npz"), **data)
    print("maskdit_tiny.npz written", out_gen.shape)


TINY_CN_CFG = dict(
    cond_in=1, cond_blocks=[16, 32], cond_mask=True, cond_mask_prob=0.25,
    cond_mask_ratio=[0.25, 0.5], cond_mask_span=4,
)


def gen_controlnet():
    sys.path.insert(0, os.path.join(REF, "src"))
    from models.controlnet import DiTControlNet

    torch.manual_seed(1)
    cfg = dict(TINY_DIT_CFG)
    for k in ("mae", "mae_prob", "mask_ratio", "mask_span"):
        cfg.pop(k)
    model = DiTControlNet(**cfg, **TINY_CN_CFG).eval()
    with torch.no_grad():
        for n, p in model.named_parameters():
            if p.abs().max() < 1e-8:
                p.add_(0.05 * torch.randn_like(p))

    B, L = 2, 32
    x = torch.randn(B, 17, L)  # MAE-concatenated input (in_chans=17)
    ctx = torch.randn(B, 5, 24)
    cmask = torch.tensor([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=torch.bool)
    t = torch.tensor([10, 500])
    cond = torch.randn(B, 1, 2 * L)  # conditioner frames before /2 pyramid

    with torch.no_grad():
        skips = model(x, t, ctx, context_mask=cmask, condition=cond,
                      conditioning_scale=0.7)

    data = {
        "x": x.numpy(), "ctx": ctx.numpy(), "cmask": cmask.numpy(),
        "t": t.numpy(), "cond": cond.numpy(),
        "n_skips": np.asarray(len(skips)),
    }
    for i, s in enumerate(skips):
        data[f"skip{i}"] = s.numpy()
    for k, v in state_dict_np(model).items():
        data[f"sd.{k}"] = v
    np.savez(os.path.join(OUT, "controlnet_tiny.npz"), **data)
    print("controlnet_tiny.npz written", len(skips))


def gen_energy():
    # import the energy module directly (the conditions package __init__
    # pulls in librosa.filters which this image lacks)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_energy", os.path.join(REF, "src", "models", "conditions", "energy.py"))
    ref_energy = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_energy)
    EnergyExtractor = ref_energy.EnergyExtractor

    torch.manual_seed(2)
    ext = EnergyExtractor(hop_size=240, window_size=1920, padding="reflect",
                          min_db=-60, norm=True)
    audio = torch.randn(2, 24000) * 0.3
    with torch.no_grad():
        energy = ext(audio)
    np.savez(os.path.join(OUT, "energy_tiny.npz"),
             audio=audio.numpy(), energy=energy.numpy())
    print("energy_tiny.npz written", energy.shape)


if __name__ == "__main__":
    _stub_missing_modules()
    gen_vae()
    gen_maskdit()
    gen_maskdit_variant()
    gen_controlnet()
    gen_energy()


def gen_dac():
    import torch.nn as tnn

    # audiotools stubs rich enough for dac imports
    at = sys.modules.get("audiotools")
    ml = types.ModuleType("audiotools.ml")

    class _BaseModel(tnn.Module):
        INTERN = []
        EXTERN = []

    ml.BaseModel = _BaseModel
    ml.Accelerator = object
    at.ml = ml
    at.STFTParams = object
    sys.modules["audiotools.ml"] = ml
    # argbind only used by the dac CLI utils package
    ab = types.ModuleType("argbind")
    ab.bind = lambda *a, **k: (lambda f: f)
    ab.parse_args = lambda: {}
    ab.scope = lambda *a, **k: None
    sys.modules.setdefault("argbind", ab)
    tq = types.ModuleType("tqdm")
    tq.tqdm = lambda x, **k: x
    sys.modules.setdefault("tqdm", tq)
    sys.path.insert(0, os.path.join(REF, "src", "modules"))
    from dac.model.dac import DAC

    torch.manual_seed(3)
    model = DAC(encoder_dim=4, encoder_rates=[2, 4], latent_dim=8,
                decoder_dim=16, decoder_rates=[4, 2], n_codebooks=3,
                codebook_size=16, codebook_dim=4, sample_rate=8000).eval()

    x = torch.randn(2, 1, 64) * 0.5
    with torch.no_grad():
        out = model(x)

    data = {
        "x": x.numpy(),
        "audio": out["audio"].numpy(),
        "z": out["z"].numpy(),
        "codes": out["codes"].numpy(),
        "latents": out["latents"].numpy(),
        "commitment": out["vq/commitment_loss"].numpy(),
        "codebook": out["vq/codebook_loss"].numpy(),
    }
    for k, v in state_dict_np(model).items():
        data[f"sd.{k}"] = v
    np.savez(os.path.join(OUT, "dac_tiny.npz"), **data)
    print("dac_tiny.npz written", out["audio"].shape)


TINY_DIT_CFG2 = dict(
    mae=True, mae_prob=0.25, mask_ratio=[0.25, 1.0], mask_span=4,
    img_size=32, patch_size=1, in_chans=17, out_chans=8, input_type="1d",
    embed_dim=64, depth=4, num_heads=4, mlp_ratio=2.0,
    qkv_bias=True, qk_scale=None, qk_norm="rmsnorm",
    norm_layer="rmsnorm", act_layer="gelu", context_norm=False,
    use_checkpoint=False, time_fusion="ada_single",
    ada_sola_rank=None, ada_sola_alpha=None, cls_dim=None,
    context_dim=24, context_fusion="concat", context_max_length=5,
    context_pe_method="sinu", pe_method="abs", rope_mode="x_only",
    use_conv=False, skip=True, skip_norm=False,
)


def gen_maskdit_variant():
    sys.path.insert(0, os.path.join(REF, "src"))
    from models.conditioners import MaskDiT

    torch.manual_seed(7)
    model = MaskDiT(**TINY_DIT_CFG2).eval()
    with torch.no_grad():
        for n, p in model.named_parameters():
            if p.abs().max() < 1e-8:
                p.add_(0.05 * torch.randn_like(p))

    B, L, C = 2, 32, 8
    x = torch.randn(B, C, L)
    ctx = torch.randn(B, 5, 24)
    cmask = torch.tensor([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=torch.bool)
    t = torch.tensor([10, 500])
    with torch.no_grad():
        out, _ = model(x, t, ctx, context_mask=cmask)
    data = {"x": x.numpy(), "ctx": ctx.numpy(), "cmask": cmask.numpy(),
            "t": t.numpy(), "out": out.numpy()}
    for k, v in state_dict_np(model).items():
        data[f"sd.{k}"] = v
    np.savez(os.path.join(OUT, "maskdit_tiny2.npz"), **data)
    print("maskdit_tiny2.npz written", out.shape)
