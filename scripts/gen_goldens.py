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
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
                import importlib.machinery as ilm

                m = types.ModuleType(name)
                m.__spec__ = ilm.ModuleSpec(name, loader=None)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
    try:
        import torchaudio  # noqa: F401
    except ImportError:
        import importlib.machinery as ilm

        ta = types.ModuleType("torchaudio")
        ta.__spec__ = ilm.ModuleSpec("torchaudio", loader=None)
        tr = types.ModuleType("torchaudio.transforms")
        tr.__spec__ = ilm.ModuleSpec("torchaudio.transforms", loader=None)
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


# ---------------------------------------------------------------------------
# Full-pipeline golden: reference inference() composed path
# (T5 -> 50-step DDIM+CFG+rescale -> scale_shift_re -> paste -> VAE decode)
# ---------------------------------------------------------------------------

class _TorchDDIM:
    """Minimal torch DDIM scheduler implementing the diffusers interface
    the reference calls (set_timesteps/timesteps/scale_model_input/
    step(...).prev_sample), written from the published algorithms:
    DDIM eq. 12 (arXiv 2010.02502), zero-terminal-SNR rescale alg. 1
    (arXiv 2305.08891), trailing spacing (same paper §4.2), v-prediction
    (arXiv 2202.00512).  diffusers itself is not installed in this image."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012):
        self.T = num_train_timesteps
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                               num_train_timesteps, dtype=torch.float64) ** 2
        ab = torch.cumprod(1.0 - betas, dim=0).sqrt()
        ab0, abT = ab[0].clone(), ab[-1].clone()
        ab = (ab - abT) * ab0 / (ab0 - abT)      # zero terminal SNR
        self.alphas_cumprod = (ab ** 2).float()
        self.final_alpha_cumprod = torch.tensor(1.0)

    def set_timesteps(self, n):
        self.n = n
        step = self.T / n
        self.timesteps = (torch.from_numpy(
            np.round(np.arange(self.T, 0, -step)).astype(np.int64) - 1))

    def scale_model_input(self, sample, t):
        return sample

    class _Out:
        def __init__(self, prev):
            self.prev_sample = prev

    def step(self, model_output, timestep, sample, eta=0.0, generator=None):
        t = int(timestep)
        prev_t = t - self.T // self.n
        a_t = self.alphas_cumprod[t]
        a_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                  else self.final_alpha_cumprod)
        # v-prediction
        x0 = a_t.sqrt() * sample - (1 - a_t).sqrt() * model_output
        eps = a_t.sqrt() * model_output + (1 - a_t).sqrt() * sample
        var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        std = eta * var.sqrt()
        direction = (1 - a_prev - std ** 2).clamp(min=0).sqrt() * eps
        prev = a_prev.sqrt() * x0 + direction
        if eta > 0:
            nz = torch.randn(sample.shape, generator=generator,
                             dtype=sample.dtype)
            prev = prev + std * nz
        return self._Out(prev)


class _TokWrap:
    """Adapter: our deterministic HashTokenizer behind the HF-tokenizer
    interface the reference inference() calls."""

    def __init__(self, vocab_size):
        from ezaudio_tpu.text.tokenizer import HashTokenizer

        self.tok = HashTokenizer(vocab_size)

    def __call__(self, texts, max_length, padding=None, truncation=None,
                 return_tensors=None):
        ids, mask = self.tok(list(texts), max_length=max_length)

        class _B:
            pass

        b = _B()
        b.input_ids = torch.from_numpy(ids.astype(np.int64))
        b.attention_mask = torch.from_numpy(mask)
        return b


def gen_pipeline():
    """Run the reference's full composed inference path on tiny models and
    save everything needed to replay it through our pipeline."""
    import torch.nn as tnn

    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "src"))
    sys.path.insert(0, os.path.join(REF, "src", "modules"))
    from models.conditioners import MaskDiT
    from stable_vae.models.autoencoders import OobleckDecoder, OobleckEncoder
    from stable_vae.models.bottleneck import VAEBottleneck
    from transformers import T5Config, T5EncoderModel

    # src/inference.py uses package-relative imports ("from .utils import");
    # load it as the package module src.inference (src has no __init__.py,
    # so synthesize the package)
    import importlib.util as ilu

    if "src" not in sys.modules:
        pkg = types.ModuleType("src")
        pkg.__path__ = [os.path.join(REF, "src")]
        sys.modules["src"] = pkg
    spec = ilu.spec_from_file_location(
        "src.inference", os.path.join(REF, "src", "inference.py"))
    inf_mod = ilu.module_from_spec(spec)
    sys.modules["src.inference"] = inf_mod
    spec.loader.exec_module(inf_mod)
    inference = inf_mod.inference

    torch.manual_seed(11)

    # tiny T5 (d_model == context_dim 24)
    t5_cfg = T5Config(vocab_size=256, d_model=24, d_kv=8, d_ff=32,
                      num_layers=2, num_heads=4, dropout_rate=0.0,
                      feed_forward_proj="gated-gelu")
    t5 = T5EncoderModel(t5_cfg).eval()

    dit = MaskDiT(**TINY_DIT_CFG).eval()
    with torch.no_grad():
        for n, pp in dit.named_parameters():
            if pp.abs().max() < 1e-8:
                pp.add_(0.05 * torch.randn_like(pp))

    vae_cfg = dict(channels=8, c_mults=[1, 2], strides=[2, 4], use_snake=True)
    enc = OobleckEncoder(in_channels=1, latent_dim=8, **vae_cfg).eval()
    dec = OobleckDecoder(out_channels=1, latent_dim=8, final_tanh=False,
                         **vae_cfg).eval()
    with torch.no_grad():
        for m in (enc, dec):
            for n, pp in m.named_parameters():
                if n.endswith("alpha") or n.endswith("beta") or "weight_g" in n:
                    pp.add_(0.3 * torch.randn_like(pp))

    class VaeShim(tnn.Module):
        """reference Autoencoder facade, stable_vae q_first branch
        (autoencoder_wrapper.py:69-83)."""

        def __init__(self):
            super().__init__()
            self.encoder, self.decoder = enc, dec
            self.bottleneck = VAEBottleneck()

        @torch.no_grad()
        def forward(self, audio=None, embedding=None):
            if audio is not None:
                return self.bottleneck.encode(self.encoder(audio))
            return self.decoder(embedding)

    vae = VaeShim().eval()
    tok = _TokWrap(vocab_size=256)

    params = {
        "text_encoder": {"max_length": 8},
        "model": {"out_chans": 8},
        "autoencoder": {"scale": 0.5, "shift": 0.1},
    }
    prompt = ["a dog barking in the rain"]
    seed = 2024
    steps, guidance, rescale = 25, 3.0, 0.75

    sched = _TorchDDIM()
    wav = inference(vae, dit, None, None, tok, t5, params, sched,
                    prompt, audio_frames=32, guidance_scale=guidance,
                    guidance_rescale=rescale, ddim_steps=steps, eta=0.0,
                    random_seed=seed, device="cpu")

    # the exact init noise inference() drew (same generator recipe)
    g = torch.Generator(device="cpu").manual_seed(seed)
    noise = torch.randn((1, 8, 32), generator=g)

    # editing variant: gt latent + mask, paste semantics
    torch.manual_seed(5)
    gt = torch.randn(1, 8, 32)
    gt_mask = torch.zeros(1, 1, 32, dtype=torch.bool)
    gt_mask[:, :, 10:22] = True  # regenerate the middle
    gt_mask_b = gt_mask.expand(1, 8, 32)
    sched2 = _TorchDDIM()
    wav_edit = inference(vae, dit, gt, gt_mask_b, tok, t5, params, sched2,
                         prompt, audio_frames=32, guidance_scale=guidance,
                         guidance_rescale=0.0, ddim_steps=steps, eta=0.0,
                         random_seed=seed, device="cpu")

    data = {
        "prompt": np.array(prompt), "noise": noise.numpy(),
        "wav": wav.numpy(), "wav_edit": wav_edit.numpy(),
        "gt": gt.numpy(), "gt_mask": gt_mask.numpy(),
        "steps": np.array(steps), "guidance": np.array(guidance),
        "rescale": np.array(rescale),
        "scale": np.array(0.5), "shift": np.array(0.1),
        "max_length": np.array(8),
    }
    for k, v in state_dict_np(dit).items():
        data[f"dit.{k}"] = v
    for k, v in state_dict_np(t5).items():
        data[f"t5.{k}"] = v
    for k, v in state_dict_np(enc).items():
        data[f"enc.{k}"] = v
    for k, v in state_dict_np(dec).items():
        data[f"dec.{k}"] = v
    np.savez(os.path.join(OUT, "pipeline_tiny.npz"), **data)
    print("pipeline_tiny.npz written", wav.shape, wav_edit.shape)


_ALL_GENS = ["vae", "maskdit", "maskdit_variant", "controlnet", "energy",
             "dac", "pipeline"]

if __name__ == "__main__":
    _stub_missing_modules()
    targets = sys.argv[1:] or _ALL_GENS
    for name in targets:
        globals()[f"gen_{name}"]()
