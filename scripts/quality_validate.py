"""Quality-validate the few-step samplers (VERDICT r1 item 4).

No real checkpoints exist in this image, so the DPM-Solver-25 /
guidance-interval "as good as DDIM-100" claims are validated on a model we
CAN train: a tiny MaskDiT trained on a synthetic conditional latent
distribution (caption class -> tone pattern in latent space).  After
training, each sampler generates from the same seeds and the Frechet
distance between generated and data distributions (the FAD math from
audio/metrics.py over latent-frame features) plus per-class conditional
error give a measured quality table.

Run (TPU or CPU):  python -u scripts/quality_validate.py [steps]
Writes a markdown table to stdout; paste into BASELINE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, C, Lc, D = 64, 8, 4, 24
N_CLASS = 4


def make_batch(rng, B):
    """Synthetic conditional latents: class k -> sinusoid bank with
    class-dependent frequencies + small noise; text embedding = one-hot-ish
    class code tiled over Lc tokens."""
    cls = rng.integers(0, N_CLASS, B)
    t = np.arange(L)[None, :, None]
    ch = np.arange(C)[None, None, :]
    freq = (cls[:, None, None] + 1) * (2 * np.pi / L)
    lat = np.sin(freq * t * (1 + ch / C)) + 0.05 * rng.standard_normal((B, L, C))
    txt = np.zeros((B, Lc, D), np.float32)
    txt[np.arange(B), :, cls] = 1.0
    return (lat.astype(np.float32), txt, cls)


def features(lat):
    """Per-sample embedding for Frechet distance: mean/std over time of
    each channel + dominant-frequency energy split."""
    lat = np.asarray(lat, np.float32)
    mean = lat.mean(1)
    std = lat.std(1)
    spec = np.abs(np.fft.rfft(lat, axis=1))
    lo = spec[:, 1:5].mean(1)
    hi = spec[:, 5:16].mean(1)
    return np.concatenate([mean, std, lo, hi], axis=1)


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.dpm import dpm_solver_sample
    from ezaudio_tpu.diffusion.sampling import (
        sample_latents, sample_latents_layer_cached)
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.optim import make_optimizer
    from ezaudio_tpu.training.trainer import TrainState, make_train_step
    from ezaudio_tpu.audio.metrics import frechet_audio_distance

    model_cfg = dict(
        mae=False, mae_prob=0.0, mask_ratio=[0.25, 1.0], mask_span=4,
        img_size=L, patch_size=1, in_chans=C, out_chans=C, input_type="1d",
        embed_dim=128, depth=4, num_heads=4, mlp_ratio=2.0,
        qkv_bias=False, qk_scale=None, qk_norm="layernorm",
        norm_layer="layernorm", act_layer="geglu", context_norm=True,
        use_checkpoint=False, time_fusion="ada_sola_bias",
        ada_sola_rank=8, ada_sola_alpha=8, cls_dim=None,
        context_dim=D, context_fusion="cross", context_max_length=None,
        context_pe_method="none", pe_method="none", rope_mode="shared",
        use_conv=True, skip=True, skip_norm=True,
    )
    diff_cfg = dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
                    beta_start=0.00085, beta_end=0.012,
                    prediction_type="v_prediction",
                    rescale_betas_zero_snr=True, timestep_spacing="trailing",
                    clip_sample=False)

    model = maskdit_from_config(model_cfg)
    schedule = DDIMSchedule.from_config(diff_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key},
                        jnp.zeros((1, L, C)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, D)))["params"]
    tx = make_optimizer(params, learning_rate=3e-4, warmup=100)
    step = make_train_step(model, schedule, tx, cfg_dropout=0.1)
    state = TrainState.create(params, tx)

    rng = np.random.default_rng(0)
    B = 64
    uncond = np.zeros((1, Lc, D), np.float32)
    t0 = time.time()
    for i in range(train_steps):
        lat, txt, _ = make_batch(rng, B)
        batch = {"latents": jnp.asarray(lat), "text": jnp.asarray(txt),
                 "text_mask": jnp.ones((B, Lc), bool),
                 "uncond": jnp.asarray(uncond),
                 "uncond_mask": jnp.ones((1, Lc), bool)}
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if i % 500 == 0 or i == train_steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"({(time.time()-t0):.0f}s)", flush=True)

    # ---- evaluation -------------------------------------------------------
    N_EVAL = 256
    lat_ref, txt_eval, cls_eval = make_batch(rng, N_EVAL)
    feats_ref = features(lat_ref)
    ctx = jnp.concatenate([jnp.asarray(txt_eval),
                           jnp.zeros((N_EVAL, Lc, D))], axis=0)

    p = {"params": state.params}

    def model_fn(latents, t):
        n = latents.shape[0]
        out, _ = model.apply(p, latents, t, ctx[: 2 * N_EVAL][:n])
        return out

    noise = jax.random.normal(jax.random.PRNGKey(7), (N_EVAL, L, C))
    guidance = 3.0

    def run_ddim(steps, interval=None, eta=1.0):
        return sample_latents(model_fn, schedule, noise,
                              jax.random.PRNGKey(8), steps,
                              guidance_scale=guidance, guidance_rescale=0.0,
                              eta=eta, guidance_interval=interval)

    configs = {
        "DDIM-100 (reference default)": lambda: run_ddim(100),
        "DDIM-50": lambda: run_ddim(50),
        "DPM-Solver++(2M)-25": lambda: dpm_solver_sample(
            model_fn, schedule, noise, 25, guidance_scale=guidance),
        "DPM-Solver++(2M)-10": lambda: dpm_solver_sample(
            model_fn, schedule, noise, 10, guidance_scale=guidance),
        "DDIM-100 + interval(100,900)": lambda: run_ddim(100, (100, 900)),
        "DDIM-100 + interval(300,800)": lambda: run_ddim(100, (300, 800)),
        # int8 quality: EVERY linear quantized (threshold dropped to 0 —
        # harsher than the production setting, which skips small layers)
        "DDIM-100 int8 (all linears)": lambda: run_ddim(100),
    }

    # layer caching: tiny model depth 4 -> half=2, k=1
    def model_full_lc(latents, t):
        n = latents.shape[0]
        (out, deep), _ = model.apply(p, latents, t, ctx[:n],
                                     collect_deep_k=1)
        return out, deep

    def model_cached_lc(latents, t, deep):
        n = latents.shape[0]
        out, _ = model.apply(p, latents, t, ctx[:n], deep_cache=(1, deep))
        return out

    for m in (2, 4):
        configs[f"DDIM-100 + layer_cache(k=1,m={m})"] = (
            lambda m=m: sample_latents_layer_cached(
                model_full_lc, model_cached_lc, schedule, noise,
                jax.random.PRNGKey(8), 100, cache_interval=m,
                guidance_scale=guidance))

    # the 36x-RT headline recipe: fewer steps x cheaper steps COMPOSED
    configs["DPM-25 + layer_cache(k=1,m=2) (36x recipe)"] = (
        lambda: dpm_solver_sample(
            model_fn, schedule, noise, 25, guidance_scale=guidance,
            layer_cache_fns=(model_full_lc, model_cached_lc),
            cache_interval=2))

    import ezaudio_tpu.ops.quant as quant_mod
    from ezaudio_tpu.ops.quant import quant_context

    print("\n| sampler | FAD (latent feats) vs data | cond. class acc |")
    print("|---|---|---|")
    for name, fn in configs.items():
        if "int8" in name:
            prev_thresh, quant_mod.MIN_QUANT_ELEMENTS = quant_mod.MIN_QUANT_ELEMENTS, 0
            with quant_context("int8"):
                out = np.asarray(jax.jit(lambda: fn())())
            quant_mod.MIN_QUANT_ELEMENTS = prev_thresh
        else:
            out = np.asarray(jax.jit(lambda: fn())())
        fad = frechet_audio_distance(features(out), feats_ref)
        # conditional fidelity: dominant latent frequency -> class
        spec = np.abs(np.fft.rfft(out.mean(-1), axis=1))
        spec[:, 0] = 0
        khat = np.clip(np.argmax(spec[:, 1 : N_CLASS + 1], axis=1), 0,
                       N_CLASS - 1)
        acc = float((khat == cls_eval).mean())
        print(f"| {name} | {fad:.3f} | {acc:.2f} |", flush=True)


if __name__ == "__main__":
    main()
