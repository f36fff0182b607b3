"""Shared mid-scale experiment plumbing: a prompt-conditioned EzAudio at
production latent geometry (vae.json: 24 kHz, x480, 128ch), the 4-class
synthetic data family, and a cached teacher-training loop.

Used by scripts/distill_serve_mid.py (distill + serve, VERDICT r3 item 6)
and scripts/quality_edit_controlnet_mid.py (editing/ControlNet quality
rows, item 3) — both need the same trained depth-12 base, so the teacher
checkpoint is cached on disk (model_io bundle keyed by geometry+steps)
and trained at most once per session.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.quality_validate_mid import latent_class, synth_clip  # noqa: E402

PROMPTS = [
    "a deep tone pulsing very slowly",
    "a low tone with a gentle beat",
    "a mid tone trembling quickly",
    "a high tone fluttering rapidly",
]
GUIDANCE = 3.0

# Experiment caches (fitted VAE, encoded latents, trained teachers,
# distill stages) live INSIDE the repo checkout, gitignored: /tmp dies
# with pool-VM rotation (r4 lesson: every cache vanished between rounds
# and the distill-serve run had to restart from zero), while the checkout
# — like .jax_cache — persists.  MID_CACHE_ROOT overrides.
CACHE_ROOT = os.environ.get(
    "MID_CACHE_ROOT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache_mid"))


def peak_wav(x):
    return (x / (np.abs(x).max() + 1e-9)).astype(np.float32)


def build_mid_ezaudio(depth: int, dim: int, heads: int, frames: int,
                      dtype=jnp.float32, with_controlnet: bool = False):
    """EzAudio at mid scale with the production VAE geometry and a tiny
    random T5 — conditioning flows through the real tokenizer->T5 path so
    the serving/editing surfaces reproduce training conditioning.
    ``with_controlnet`` adds the reference energy-ControlNet blocks
    (ckpts/controlnet/energy_l.yml geometry) to the config so
    ``EzAudioControlNet(base=ez)`` can attach."""
    from ezaudio_tpu.api.ezaudio import EzAudio
    from ezaudio_tpu.config import MODEL_REGISTRY
    from ezaudio_tpu.text.t5 import T5EncoderConfig

    with open(os.path.join(os.path.dirname(MODEL_REGISTRY["vae"]["config"]),
                           "vae.json")) as f:
        vae_cfg = json.load(f)
    C = vae_cfg["model"]["latent_dim"]
    sr = vae_cfg["sample_rate"]
    ratio = vae_cfg["model"]["downsampling_ratio"]

    model_cfg = dict(
        mae=False, mae_prob=0.0, mask_ratio=[0.25, 1.0], mask_span=4,
        img_size=frames, patch_size=1, in_chans=C, out_chans=C,
        input_type="1d", embed_dim=dim, depth=depth, num_heads=heads,
        mlp_ratio=4.0, qkv_bias=False, qk_scale=None, qk_norm="layernorm",
        norm_layer="layernorm", act_layer="geglu", context_norm=True,
        use_checkpoint=False, time_fusion="ada_sola_bias",
        ada_sola_rank=32, ada_sola_alpha=32, cls_dim=None,
        context_dim=64, context_fusion="cross", context_max_length=None,
        context_pe_method="none", pe_method="none", rope_mode="shared",
        use_conv=True, skip=True, skip_norm=True,
    )
    cfg = dict(
        model_name="EzAudio-Mid",
        model=model_cfg,
        autoencoder=dict(name="stable_vae", dim=C, sr=sr,
                         latent_sr=sr // ratio, q_first=True,
                         scale=1.0, shift=0.0),
        text_encoder=dict(model="tiny-t5", max_length=8, cfg=0.1),
        diff=dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
                  beta_start=0.00085, beta_end=0.012,
                  prediction_type="v_prediction",
                  rescale_betas_zero_snr=True, timestep_spacing="trailing",
                  clip_sample=False),
    )
    if with_controlnet:
        # reference geometry: /root/reference/ckpts/controlnet/energy_l.yml
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[64, 128],
                                 cond_mask=True, cond_mask_prob=0.25,
                                 cond_mask_ratio=[0.25, 0.50],
                                 cond_mask_span=10)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=240,
                                  window_size=1920, padding="reflect",
                                  min_db=-60, norm=True)
    t5_cfg = T5EncoderConfig(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                             num_layers=2, num_heads=4,
                             relative_attention_num_buckets=8,
                             relative_attention_max_distance=20)
    ez = EzAudio(config=cfg, t5_config=t5_cfg, vae_config=vae_cfg,
                 dtype=dtype)
    return ez, cfg, model_cfg, vae_cfg


def roundtrip_latents(ez, lat_m, mu, sd):
    """model-space latents -> decode -> audio -> encode -> model space.
    Scoring generated audio re-encodes it; applying the same
    decode/encode roundtrip to the reference side keeps the comparison
    fair (the random VAE is not exactly invertible)."""
    outs = []
    for i in range(0, len(lat_m), 8):
        z = lat_m[i : i + 8] * sd + mu
        wav = np.asarray(ez.autoencoder.decode(jnp.asarray(z)))
        if wav.ndim == 2:
            wav = wav[:, :, None]
        z2 = ez.autoencoder.encode(jnp.asarray(wav), sample=False)
        outs.append(np.asarray(z2, np.float32))
    return (np.concatenate(outs, 0) - mu) / sd


def _save_params(folder, params, meta):
    os.makedirs(folder, exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat["/".join(getattr(p, "key", str(p)) for p in path)] = \
            np.asarray(leaf)
    np.savez(os.path.join(folder, "params.npz"), **flat)
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(meta, f)


def _load_params(folder):
    flat = dict(np.load(os.path.join(folder, "params.npz")))
    params = {}
    for key, value in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    with open(os.path.join(folder, "meta.json")) as f:
        return params, json.load(f)


def fit_vae(ez, steps: int = 1500, batch: int = 4, seg_s: float = 1.0,
            cache_dir: str = None):
    """Briefly train ez's production-geometry Oobleck VAE on the synth
    family (MRSTFT + KL + adversarial, training/codec_trainer.py) so the
    DECODER is non-degenerate — a random decoder collapses to
    near-constant audio, which silently zeroes every decode->encode
    roundtrip metric (observed: roundtrip feature spread 1e-4).  Cached
    on disk keyed by steps; injects the params into ez.autoencoder."""
    fit_vae_facade(ez.autoencoder, ez.sr, steps=steps, batch=batch,
                   seg_s=seg_s, cache_dir=cache_dir)


def fit_vae_facade(facade, sr, steps: int = 1500, batch: int = 4,
                   seg_s: float = 1.0, cache_dir: str = None):
    """fit_vae at the AutoencoderFacade level (quality_validate_mid builds
    a bare facade, no EzAudio); same disk cache, so all mid-scale
    harnesses share one fitted VAE per (steps, batch)."""
    from ezaudio_tpu.codecs.discriminator import Discriminator
    from ezaudio_tpu.training.codec_trainer import (
        init_codec_train_state, make_codec_train_steps)

    if cache_dir is None:
        cache_dir = os.path.join(CACHE_ROOT, "mid_vae")
    folder = os.path.join(cache_dir, f"s{steps}_b{batch}")
    if os.path.exists(os.path.join(folder, "params.npz")):
        params, _ = _load_params(folder)
        facade.params = params
        print(f"[vae] reusing cached fitted VAE: {folder}", flush=True)
        return
    seg = int(seg_s * sr)
    rng = np.random.default_rng(42)
    # a pool of full clips to crop from (all 4 classes)
    pool = np.stack([synth_clip(rng, c % len(PROMPTS), 4 * sr, sr)
                     for c in range(32)])
    pool /= np.abs(pool).max(axis=1, keepdims=True) + 1e-9

    disc = Discriminator(periods=(2, 3), fft_sizes=(1024, 512), rates=(),
                         sample_rate=sr)
    step_fn, gtx, dtx = make_codec_train_steps(
        facade.model, disc, codec_kind="vae", sample_rate=sr,
        gen_lr=3e-4, disc_lr=3e-4, warmup=0.0,
        stft_windows=(2048, 1024, 512, 256))

    def crops(n):
        idx = rng.integers(0, len(pool), n)
        off = rng.integers(0, pool.shape[1] - seg, n)
        return np.stack([pool[i, o : o + seg] for i, o in zip(idx, off)])

    audio0 = jnp.asarray(crops(batch)[:, :, None])
    state = init_codec_train_state(facade.model, disc, gtx, dtx,
                                   jax.random.PRNGKey(5), audio0,
                                   gen_params=facade.params)
    # Adversarial VAE fits can destabilize late (observed: mrstft
    # 3.9 -> 4784 at step 1250 of 1500) — keep the best smoothed-mrstft
    # snapshot instead of trusting the final step.
    t1 = time.time()
    ema, best_ema, best_params = None, float("inf"), None
    for i in range(steps):
        audio = jnp.asarray(crops(batch)[:, :, None])
        state, m = step_fn(state, audio, jax.random.PRNGKey(i))
        cur = float(m["gen/mrstft"])
        ema = cur if ema is None else 0.95 * ema + 0.05 * cur
        if i >= steps // 4 and i % 50 == 0 and ema < best_ema:
            best_ema = ema
            best_params = jax.device_get(state.gen_params)
        if i % 250 == 0 or i == steps - 1:
            print(f"  [vae] step {i}: mrstft {cur:.4f} "
                  f"(ema {ema:.4f}, best {best_ema:.4f}, "
                  f"{time.time()-t1:.0f}s)", flush=True)
    if best_params is None or ema < best_ema:
        best_params, best_ema = jax.device_get(state.gen_params), ema
    print(f"[vae] keeping snapshot at ema mrstft {best_ema:.4f}",
          flush=True)
    facade.params = best_params
    _save_params(folder, facade.params,
                 {"steps": steps, "best_ema_mrstft": best_ema})
    print(f"[vae] cached: {folder}", flush=True)


def _vae_fingerprint(params):
    """Cheap content fingerprint of a (host-side numpy) param tree, used
    to key the encoded-latents cache on the exact fitted VAE."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        total += float(np.float64(np.abs(np.asarray(leaf)).sum()))
    return f"{total:.6e}".replace("+", "")


def prepare_data(ez, frames: int, n_train: int, n_eval: int,
                 min_readout_acc: float = 0.95,
                 cache_dir: str = None):
    """Synthesize the 4-class distribution, encode through ez's own VAE,
    normalize, and wire the inverse into ez.scale/ez.shift so decode
    reproduces audio from model-space latents.  Returns a dict.

    The encode of ~1k clips costs ~15 min through the axon tunnel, so the
    latents are disk-cached keyed by (frames, n_train, n_eval, VAE param
    fingerprint); text embeddings are cheap and recomputed every call."""
    sr = ez.sr
    ratio = sr // ez.latent_sr

    if cache_dir is None:
        cache_dir = os.path.join(CACHE_ROOT, "mid_data")
    folder = os.path.join(
        cache_dir, f"f{frames}_t{n_train}_e{n_eval}_"
        f"{_vae_fingerprint(ez.autoencoder.params)}")
    cache_npz = os.path.join(folder, "latents.npz")
    if os.path.exists(cache_npz):
        z = dict(np.load(cache_npz))
        mu, sd = float(z["mu"]), float(z["sd"])
        ez.scale = 1.0 / sd
        ez.shift = -mu
        acc_ref = float(
            (latent_class(z["m_eval"]) == z["cls_eval"]).mean())
        print(f"[data] reusing cached latents: {folder} "
              f"(readout {acc_ref:.3f})", flush=True)
        assert acc_ref >= (min_readout_acc if frames >= 250 else 0.8)
        cond_emb, cond_mask = ez.embed_text(PROMPTS)
        unc_emb, unc_mask = ez.embed_text([""])
        return dict(
            m_train=z["m_train"], cls_train=z["cls_train"],
            m_eval=z["m_eval"], cls_eval=z["cls_eval"], mu=mu, sd=sd,
            cond_emb=np.asarray(cond_emb, np.float32),
            cond_mask=np.asarray(cond_mask),
            unc_emb=np.asarray(unc_emb, np.float32),
            unc_mask=np.asarray(unc_mask),
        )

    def encode_clips(n, seed):
        rng = np.random.default_rng(seed)
        cls = rng.integers(0, len(PROMPTS), n)
        zs = []
        for i in range(0, n, 8):
            # peak-normalized: the editing/ControlNet product surfaces
            # peak_normalize every gt input (api parity with the
            # reference), so the model must be TRAINED at that level
            wavs = np.stack([peak_wav(synth_clip(rng, int(c),
                                                 frames * ratio, sr))
                             for c in cls[i : i + 8]])
            z = ez.autoencoder.encode(wavs[:, :, None], sample=False)
            zs.append(np.asarray(z, np.float32))
        return np.concatenate(zs, 0), cls

    t0 = time.time()
    z_train, cls_train = encode_clips(n_train, seed=0)
    z_eval, cls_eval = encode_clips(n_eval, seed=1)
    mu = float(z_train.mean())
    sd = float(z_train.std()) + 1e-6
    # model space m = (z - mu)/sd; API decode applies z = m/scale - shift
    ez.scale = 1.0 / sd
    ez.shift = -mu
    m_train = (z_train - mu) / sd
    m_eval = (z_eval - mu) / sd
    print(f"encoded {n_train}+{n_eval} clips in {time.time()-t0:.0f}s; "
          f"mu {mu:.4f} sd {sd:.4f}", flush=True)
    os.makedirs(folder, exist_ok=True)
    np.savez(cache_npz, m_train=m_train, cls_train=cls_train,
             m_eval=m_eval, cls_eval=cls_eval, mu=mu, sd=sd)
    print(f"[data] cached: {folder}", flush=True)
    acc_ref = float((latent_class(m_eval) == cls_eval).mean())
    print(f"readout accuracy on reference latents: {acc_ref:.3f}", flush=True)
    # short smoke clips lose AM-rate spectral resolution; the real gate
    # applies at the production 10 s geometry
    assert acc_ref >= (min_readout_acc if frames >= 250 else 0.8)

    cond_emb, cond_mask = ez.embed_text(PROMPTS)
    unc_emb, unc_mask = ez.embed_text([""])
    return dict(
        m_train=m_train, cls_train=cls_train, m_eval=m_eval,
        cls_eval=cls_eval, mu=mu, sd=sd,
        cond_emb=np.asarray(cond_emb, np.float32),
        cond_mask=np.asarray(cond_mask),
        unc_emb=np.asarray(unc_emb, np.float32),
        unc_mask=np.asarray(unc_mask),
    )


def train_teacher(ez, model_cfg, data, steps: int, batch: int,
                  lr: float = 2e-4, cache_dir: str = None,
                  tag: str = "teacher"):
    """Train the DiT on the prompt-conditioned data (cfg-dropout 0.1),
    caching the result as a model_io bundle keyed by geometry+steps.
    Returns the param tree (also injected into ez.dit_params)."""
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.training.model_io import load_model, save_model
    from ezaudio_tpu.training.optim import make_optimizer
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

    if cache_dir is None:
        cache_dir = os.path.join(CACHE_ROOT, "mid_teacher")
    key = (f"d{model_cfg['depth']}_w{model_cfg['embed_dim']}_"
           f"L{model_cfg['img_size']}_s{steps}_b{batch}")
    folder = os.path.join(cache_dir, key)
    if os.path.exists(os.path.join(folder, "params.npz")):
        # the cached teacher is only valid for the exact architecture
        # (the key omits e.g. num_heads — observed stale-cache shape
        # error) and with its own latent norm
        with open(os.path.join(folder, "metadata.json")) as f:
            cached_cfg = json.load(f)["kwargs"]["model"]
        _, params, meta = load_model(folder)
        if (cached_cfg == dict(model_cfg)
                and abs(meta.get("latent_mu", 1e9) - data["mu"]) < 1e-6
                and abs(meta.get("latent_sd", 1e9) - data["sd"]) < 1e-6):
            print(f"[{tag}] reusing cached teacher: {folder}", flush=True)
            ez.dit_params = {"params": params}
            return params
        print(f"[{tag}] cache at {folder} does not match "
              f"(arch or latent norm) — retraining", flush=True)

    schedule = DDIMSchedule.from_config(
        dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
             beta_start=0.00085, beta_end=0.012,
             prediction_type="v_prediction", rescale_betas_zero_snr=True,
             timestep_spacing="trailing", clip_sample=False))
    p0 = ez.dit_params["params"]
    tx = make_optimizer(p0, learning_rate=lr, warmup=200)
    step_fn = make_train_step(ez.dit, schedule, tx, cfg_dropout=0.1)
    state = TrainState.create(p0, tx)
    rng = np.random.default_rng(0)
    n_train = len(data["m_train"])
    t1 = time.time()
    for i in range(steps):
        idx = rng.integers(0, n_train, batch)
        b = {"latents": jnp.asarray(data["m_train"][idx]),
             "text": jnp.asarray(data["cond_emb"][data["cls_train"][idx]]),
             "text_mask": jnp.asarray(data["cond_mask"][data["cls_train"][idx]]),
             "uncond": jnp.asarray(data["unc_emb"]),
             "uncond_mask": jnp.asarray(data["unc_mask"])}
        state, metrics = step_fn(state, b, jax.random.PRNGKey(i))
        if i % 500 == 0 or i == steps - 1:
            print(f"  [{tag}] step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.time()-t1:.0f}s)", flush=True)
    save_model(folder, "maskdit", {"model": model_cfg}, state.params,
               extra_metadata={"latent_mu": data["mu"],
                               "latent_sd": data["sd"], "steps": steps})
    print(f"[{tag}] cached: {folder}", flush=True)
    ez.dit_params = {"params": state.params}
    return state.params
