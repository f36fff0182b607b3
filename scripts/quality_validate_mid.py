"""Mid-scale quality validation of the acceleration recipes (VERDICT r2
item 3: the round-2 table came from a depth-4/dim-128 toy on synthetic
tone-bank latents; the layer-cache cliff and sampler rankings needed
re-measuring at a credible proxy scale).

This harness:
  * synthesizes a 4-class audio distribution at 24 kHz (class = carrier
    f0 x amplitude-modulation rate) and encodes it through the ACTUAL
    production Oobleck VAE architecture (configs/vae.json: x480
    downsample -> real 500-frame / 128-channel latents; random weights —
    no published checkpoints exist in this image, and the latent
    *distribution* is what the diffusion model learns either way);
  * trains a mid MaskDiT (default depth 12 / dim 512 / 8 heads — between
    the toy and s3_l) for a few thousand TPU steps on those latents;
  * scores every acceleration recipe with the same Frechet-distance +
    conditional-accuracy harness as scripts/quality_validate.py, PLUS the
    two families that never had a quality row: flow matching
    (diffusion/flow.py, trains a second model) and progressive
    distillation (diffusion/distill.py, 2 halving stages).

Sanity gate: the conditional readout (AM rate of the latent energy
envelope) must classify the REFERENCE latents at >= 0.95 accuracy before
any training happens — otherwise the harness itself is broken.

CLAP columns (VERDICT r4 item 3 — the paper's metric family): when
MID_CLAP=1 (default), every row additionally reports the CLAP score
(mean prompt<->audio cosine through the native tower, models/clap.py —
the EzAudio paper's headline column) and FAD over CLAP audio embeddings,
computed on DECODED audio through a briefly-fitted production VAE
(mid_common.fit_vae_facade — a random decoder would make audio-domain
metrics degenerate).  With random-init CLAP weights the columns are
RELATIVE-only (recipe-vs-anchor ordering within this table); point
MID_CLAP_WEIGHTS at a local laion/clap-htsat-unfused state dict (and
MID_CLAP_TOKENIZER at its tokenizer dir) to make them
literature-shaped.  Reference seam: /root/reference/src/modules/
clap_wrapper.py (empty) + README.md:104-113 metric claims.

Run (TPU):  python -u scripts/quality_validate_mid.py
Env knobs (defaults in brackets): MID_DEPTH [12] MID_DIM [512]
MID_HEADS [8] MID_FRAMES [500] MID_TRAIN_STEPS [4000] MID_BATCH [16]
MID_N_TRAIN [1024] MID_N_EVAL [128] MID_EVAL_CHUNK [32] MID_FLOW [1]
MID_DISTILL [1] MID_DISTILL_STEPS [1500] MID_CLAP [1] MID_VAE_STEPS [1500]
CPU smoke:  MID_DEPTH=2 MID_DIM=64 MID_FRAMES=50 MID_TRAIN_STEPS=30
            MID_N_TRAIN=32 MID_N_EVAL=16 MID_EVAL_CHUNK=8 MID_VAE_STEPS=5
Writes a markdown table to stdout; paste into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

if __name__ == "__main__":
    # Platform/cache side effects ONLY when run as a script: importers
    # (mid_common, the edit/controlnet and distill-serve harnesses) pull
    # synth_clip/features/latent_class from here and configure jax
    # themselves — a module-level `else` branch used to point their CPU
    # smokes at the repo-root TPU compile cache (cross-VM AOT mismatch).
    if os.environ.get("MID_CPU") == "1":
        # the axon sitecustomize force-overrides JAX_PLATFORMS; the config
        # knob wins (CLAUDE.md) — CPU smokes must not touch the shared TPU
        jax.config.update("jax_platforms", "cpu")
    else:
        _cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

E = os.environ.get
DEPTH = int(E("MID_DEPTH", "12"))
DIM = int(E("MID_DIM", "512"))
HEADS = int(E("MID_HEADS", "8"))
FRAMES = int(E("MID_FRAMES", "500"))
TRAIN_STEPS = int(E("MID_TRAIN_STEPS", "4000"))
BATCH = int(E("MID_BATCH", "16"))
N_TRAIN = int(E("MID_N_TRAIN", "1024"))
N_EVAL = int(E("MID_N_EVAL", "128"))
CHUNK = int(E("MID_EVAL_CHUNK", "32"))
RUN_FLOW = E("MID_FLOW", "1") == "1"
RUN_DISTILL = E("MID_DISTILL", "1") == "1"
DISTILL_STEPS = int(E("MID_DISTILL_STEPS", "1500"))
# flagship-geometry knobs (VERDICT r3 item 2: depth 24 / dim 1024 needs
# per-block remat to fit training activations, and a gentler lr)
REMAT = E("MID_REMAT", "1" if DEPTH >= 16 else "0") == "1"
LR = float(E("MID_LR", "2e-4"))
RUN_CLAP = E("MID_CLAP", "1") == "1"
VAE_STEPS = int(E("MID_VAE_STEPS", "1500"))

Lc, D = 4, 64
N_CLASS = 4
F0S = (220.0, 330.0, 440.0, 660.0)
AMS = (2.0, 4.0, 7.0, 11.0)
GUIDANCE = 3.0
LATENT_FPS = 50.0  # frames per second at x480 / 24 kHz


# ---------------------------------------------------------------------------
# data: 4-class audio -> real Oobleck latents
# ---------------------------------------------------------------------------

def synth_clip(rng, cls: int, n_samples: int, sr: int) -> np.ndarray:
    t = np.arange(n_samples) / sr
    f0, am = F0S[cls], AMS[cls]
    carrier = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
                  / k for k in range(1, 5))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * am * t + rng.uniform(0, 2 * np.pi))
    x = carrier * env + 0.003 * rng.standard_normal(n_samples)
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def make_vae():
    from ezaudio_tpu.codecs.facade import AutoencoderFacade
    from ezaudio_tpu.codecs.oobleck import vae_from_config
    from ezaudio_tpu.config import MODEL_REGISTRY

    with open(os.path.join(os.path.dirname(MODEL_REGISTRY["vae"]["config"]),
                           "vae.json")) as f:
        vae_cfg = json.load(f)
    model = vae_from_config(vae_cfg, dtype=jnp.float32)
    r = model.downsampling_ratio
    params = model.init({"params": jax.random.PRNGKey(11),
                         "sample": jax.random.PRNGKey(12)},
                        jnp.zeros((1, 4 * r, 1)))["params"]
    return AutoencoderFacade(model, params), vae_cfg["sample_rate"], r


def encode_dataset(n_clips: int, seed: int, facade=None, sr=None,
                   ratio=None):
    """(n, FRAMES, C) normalized latents + class labels via the real VAE.
    Pass a shared (possibly fitted) facade; a fresh random one is built
    when omitted (legacy callers)."""
    if facade is None:
        facade, sr, ratio = make_vae()
    n_samples = FRAMES * ratio
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, N_CLASS, n_clips)
    lats = []
    eb = max(1, min(8, n_clips))
    for i in range(0, n_clips, eb):
        wavs = np.stack([synth_clip(rng, int(c), n_samples, sr)
                         for c in cls[i : i + eb]])
        z = facade.encode(wavs[:, :, None], sample=False)
        lats.append(np.asarray(z, np.float32))
    lat = np.concatenate(lats, axis=0)
    return lat, cls


def _crc_tokenizer(cfg, max_len: int = 16):
    """Deterministic host-side stand-in tokenizer (crc32 word hash onto
    the RoBERTa id space, bos=0/eos=2/pad=1 framing).  With random-init
    CLAP weights any injective tokenization is equivalent; swap for the
    real RoBERTa BPE (MID_CLAP_TOKENIZER) when using published weights."""
    import zlib

    def tok(texts):
        ids = np.full((len(texts), max_len), cfg.text.pad_token_id,
                      np.int64)
        am = np.zeros((len(texts), max_len), np.int64)
        for i, t in enumerate(texts):
            body = [5 + zlib.crc32(w.encode()) % (cfg.text.vocab_size - 10)
                    for w in t.lower().split()][: max_len - 2]
            toks = [0] + body + [2]
            ids[i, : len(toks)] = toks
            am[i, : len(toks)] = 1
        return ids, am

    return tok


def make_clap_scorer():
    """Native CLAP scorer; MID_CLAP_WEIGHTS (local transformers-format
    state dict) + MID_CLAP_TOKENIZER (local tokenizer dir) make the
    columns literature-shaped; without them the scorer is random-init
    and the columns are relative-only (printed caveat)."""
    from ezaudio_tpu.audio.clap import CLAPScorer

    weights = None
    wpath = E("MID_CLAP_WEIGHTS")
    if wpath:
        import torch

        weights = torch.load(wpath, map_location="cpu")
        if hasattr(weights, "state_dict"):
            weights = weights.state_dict()
    scorer = CLAPScorer(weights=weights)
    tok_dir = E("MID_CLAP_TOKENIZER")
    if tok_dir:
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(tok_dir)

        def tok(texts):
            enc = hf_tok(list(texts), padding=True, return_tensors="np")
            return (np.asarray(enc["input_ids"]),
                    np.asarray(enc["attention_mask"]))

        scorer.tokenizer = tok
    else:
        scorer.tokenizer = _crc_tokenizer(scorer.cfg)
    return scorer, weights is not None


def class_text(cls: np.ndarray) -> np.ndarray:
    txt = np.zeros((len(cls), Lc, D), np.float32)
    txt[np.arange(len(cls)), :, cls] = 1.0
    return txt


def latent_class(lat: np.ndarray) -> np.ndarray:
    """Readout: AM rate of the per-frame energy envelope -> class."""
    lat = np.asarray(lat, np.float32)
    e = (lat ** 2).mean(-1)
    e = e - e.mean(1, keepdims=True)
    spec = np.abs(np.fft.rfft(e, axis=1))
    seconds = lat.shape[1] / LATENT_FPS
    bins = [int(round(am * seconds)) for am in AMS]
    # each class scores the energy in a +-1-bin window around its AM line
    scores = np.stack([spec[:, max(b - 1, 1) : b + 2].max(1) for b in bins],
                      axis=1)
    return scores.argmax(1)


def features(lat: np.ndarray) -> np.ndarray:
    """Per-sample embedding for the Frechet distance: channel stats +
    energy-envelope spectrum bands."""
    lat = np.asarray(lat, np.float32)
    mean = lat.mean(1)
    std = lat.std(1)
    e = (lat ** 2).mean(-1)
    e = e - e.mean(1, keepdims=True)
    spec = np.abs(np.fft.rfft(e, axis=1))
    nb = 16
    edges = np.linspace(1, spec.shape[1], nb + 1).astype(int)
    bands = np.stack([spec[:, a:b].mean(1)
                      for a, b in zip(edges[:-1], edges[1:])], axis=1)
    return np.concatenate([mean, std, bands], axis=1)


# ---------------------------------------------------------------------------

def main():  # noqa: C901 — linear experiment script
    from ezaudio_tpu.audio.metrics import frechet_audio_distance
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.dpm import dpm_solver_sample
    from ezaudio_tpu.diffusion.sampling import (
        sample_latents, sample_latents_layer_cached)
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.optim import make_optimizer
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

    C = 128  # production latent channels (vae.json)
    print(f"mid-scale harness: depth {DEPTH} dim {DIM} heads {HEADS} "
          f"L={FRAMES} C={C}; {TRAIN_STEPS} steps batch {BATCH}; "
          f"{N_TRAIN}+{N_EVAL} clips through the real Oobleck VAE",
          flush=True)

    facade, sr_audio, ratio = make_vae()
    if RUN_CLAP:
        # audio-domain CLAP rows need a non-degenerate decoder; the fit
        # is disk-cached and shared with distill_serve_mid
        from scripts.mid_common import fit_vae_facade

        fit_vae_facade(facade, sr_audio, steps=VAE_STEPS, batch=4)

    t0 = time.time()
    from scripts.mid_common import CACHE_ROOT, _vae_fingerprint

    enc_cache = os.path.join(
        CACHE_ROOT, "qv_latents",
        f"f{FRAMES}_t{N_TRAIN}_e{N_EVAL}_{_vae_fingerprint(facade.params)}"
        ".npz")
    if E("MID_CACHE", "1") == "1" and os.path.exists(enc_cache):
        z = dict(np.load(enc_cache))
        lat_train, cls_train = z["lat_train"], z["cls_train"]
        lat_eval, cls_eval = z["lat_eval"], z["cls_eval"]
        print(f"[data] reusing cached latents: {enc_cache}", flush=True)
    else:
        lat_train, cls_train = encode_dataset(N_TRAIN, 0, facade,
                                              sr_audio, ratio)
        lat_eval, cls_eval = encode_dataset(N_EVAL, 1, facade,
                                            sr_audio, ratio)
        if E("MID_CACHE", "1") == "1":
            os.makedirs(os.path.dirname(enc_cache), exist_ok=True)
            np.savez(enc_cache, lat_train=lat_train, cls_train=cls_train,
                     lat_eval=lat_eval, cls_eval=cls_eval)
    mu = lat_train.mean((0, 1), keepdims=True)
    sd = lat_train.std((0, 1), keepdims=True) + 1e-6
    lat_train = (lat_train - mu) / sd
    lat_eval = (lat_eval - mu) / sd
    print(f"encoded {N_TRAIN}+{N_EVAL} clips in {time.time()-t0:.0f}s; "
          f"latent std pre-norm {float(sd.mean()):.4f}", flush=True)

    # harness sanity gate: the readout must classify REFERENCE latents
    acc_ref = float((latent_class(lat_eval) == cls_eval).mean())
    print(f"readout accuracy on reference latents: {acc_ref:.3f}",
          flush=True)
    assert acc_ref >= 0.95, (
        "conditional readout cannot classify the reference latents — "
        "harness invalid at this geometry")

    model_cfg = dict(
        mae=False, mae_prob=0.0, mask_ratio=[0.25, 1.0], mask_span=4,
        img_size=FRAMES, patch_size=1, in_chans=C, out_chans=C,
        input_type="1d", embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, qkv_bias=False, qk_scale=None, qk_norm="layernorm",
        norm_layer="layernorm", act_layer="geglu", context_norm=True,
        use_checkpoint=REMAT, time_fusion="ada_sola_bias",
        ada_sola_rank=32, ada_sola_alpha=32, cls_dim=None,
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
    # count params abstractly — a real init here would pin a full f32
    # copy for the rest of main() (3.5 GB at depth 28, the r5 qv28 OOM)
    abs_params = jax.eval_shape(
        lambda: model.init({"params": key, "mask": key},
                           jnp.zeros((1, FRAMES, C)),
                           jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 1, D)))["params"])
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(abs_params))
    print(f"mid MaskDiT: {n_params/1e6:.1f}M params", flush=True)

    def train(loss_kind: str, steps: int, seed: int):
        """Train a fresh model copy; loss_kind 'diffusion' | 'flow'.

        Results are disk-cached keyed by the full deterministic recipe
        (geometry + steps + seed + lr + data sizes + backend), so a
        second invocation with a different MID_ROWS subset — or a rerun
        after a session death — reuses the trained teacher instead of
        paying the full retrain (flagship depth-24 costs ~19 min).
        MID_CACHE=0 disables."""
        cache_key = (f"{loss_kind}_d{DEPTH}_w{DIM}_h{HEADS}_L{FRAMES}"
                     f"_s{steps}_b{BATCH}_n{N_TRAIN}_lr{LR:g}_seed{seed}"
                     f"_{jax.default_backend()}"
                     + (f"_mu{E('MID_MU_DTYPE')}" if E("MID_MU_DTYPE")
                        else "")
                     # the training data depends on the (possibly fitted)
                     # VAE — key on it so a CLAP-mode run never reuses a
                     # teacher trained on random-VAE latents
                     + f"_v{_vae_fingerprint(facade.params)}")
        cache_dir = os.path.join(
            E("MID_CACHE_DIR", os.path.join(CACHE_ROOT, "qv_cache")),
            cache_key)
        use_cache = E("MID_CACHE", "1") == "1"
        npz = os.path.join(cache_dir, "params.npz")
        if use_cache and os.path.exists(npz):
            from scripts.mid_common import _load_params
            params, _ = _load_params(cache_dir)
            print(f"  [{loss_kind}] reusing cached params: {cache_dir}",
                  flush=True)
            return jax.tree.map(jnp.asarray, params)
        p0 = model.init({"params": jax.random.PRNGKey(seed),
                         "mask": jax.random.PRNGKey(seed)},
                        jnp.zeros((1, FRAMES, C)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, D)))["params"]
        # MID_MU_DTYPE=bfloat16 halves the first-moment HBM (needed to
        # fit the 866.7M depth-28 teacher + Adam + activations on one
        # 16 GB chip; optimizer numerics caveat documented in optim.py)
        tx = make_optimizer(p0, learning_rate=LR, warmup=200,
                            mu_dtype=E("MID_MU_DTYPE") or None)
        if loss_kind == "diffusion":
            step = make_train_step(model, schedule, tx, cfg_dropout=0.1)
        else:
            from ezaudio_tpu.diffusion.flow import (
                FlowSchedule, flow_matching_loss)

            fsched = FlowSchedule()
            import functools

            import optax

            def loss_fn(p, batch, rng):
                k_t, k_n, k_cfg = jax.random.split(rng, 3)
                x0 = batch["latents"]
                B = x0.shape[0]
                drop = jax.random.uniform(k_cfg, (B,)) < 0.1
                text = jnp.where(drop[:, None, None],
                                 jnp.zeros_like(batch["text"]), batch["text"])
                noise = jax.random.normal(k_n, x0.shape, x0.dtype)
                t = jax.random.uniform(k_t, (B,))

                def apply(pp, xt, tt, rngs=None):
                    return model.apply({"params": pp}, xt, tt, text)

                return flow_matching_loss(apply, p, x0, noise, t,
                                          schedule=fsched)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _step(state, batch, rng):
                rng = jax.random.fold_in(rng, state.step)
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch, rng)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                p = optax.apply_updates(state.params, updates)
                return state.replace(step=state.step + 1, params=p,
                                     opt_state=opt_state), {"loss": loss}

            step = _step
        state = TrainState.create(p0, tx)
        rng = np.random.default_rng(seed)
        t1 = time.time()
        for i in range(steps):
            idx = rng.integers(0, N_TRAIN, BATCH)
            batch = {"latents": jnp.asarray(lat_train[idx]),
                     "text": jnp.asarray(class_text(cls_train[idx])),
                     "text_mask": jnp.ones((BATCH, Lc), bool),
                     "uncond": jnp.zeros((1, Lc, D), jnp.float32),
                     "uncond_mask": jnp.ones((1, Lc), bool)}
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            if i % 500 == 0 or i == steps - 1:
                print(f"  [{loss_kind}] step {i}: "
                      f"loss {float(metrics['loss']):.4f} "
                      f"({time.time()-t1:.0f}s)", flush=True)
        if use_cache:
            from scripts.mid_common import _save_params
            _save_params(cache_dir, jax.device_get(state.params),
                         {"key": cache_key, "steps": steps})
            print(f"  [{loss_kind}] cached: {cache_dir}", flush=True)
        return state.params

    diff_params = train("diffusion", TRAIN_STEPS, seed=0)

    # ------------------------------------------------------------------
    # evaluation harness: chunked sampling, params as jit args
    # ------------------------------------------------------------------
    feats_ref = features(lat_eval)
    txt_eval = class_text(cls_eval)
    noise_all = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (N_EVAL, FRAMES, C)))

    def model_fn_for(ctx_pair):
        def model_fn(lat, t):
            n = lat.shape[0]
            out, _ = model.apply({"params": model_fn.params}, lat, t,
                                 ctx_pair[:n])
            return out
        return model_fn

    def run_config(builder, quant_int8=False, attn_impl=None):
        """builder(params, noise_c, ctx_pair) -> latents, jitted once and
        mapped over eval chunks (params as jit args — never closure
        constants; CLAUDE.md probe8 lesson).  attn_impl sets
        EZAUDIO_ATTN_IMPL for the whole config (trace-time env — the jit
        traces on the first chunk under this setting)."""
        if attn_impl is not None:
            os.environ["EZAUDIO_ATTN_IMPL"] = attn_impl
        try:
            return _run_config_inner(builder, quant_int8)
        finally:
            if attn_impl is not None:
                os.environ.pop("EZAUDIO_ATTN_IMPL", None)

    def _run_config_inner(builder, quant_int8):
        jfn = jax.jit(builder)
        outs = []
        for i in range(0, N_EVAL, CHUNK):
            noise_c = jnp.asarray(noise_all[i : i + CHUNK])
            txt_c = jnp.asarray(txt_eval[i : i + CHUNK])
            ctx_pair = jnp.concatenate([txt_c, jnp.zeros_like(txt_c)], 0)
            if quant_int8:
                import ezaudio_tpu.ops.quant as qm
                from ezaudio_tpu.ops.quant import quant_context

                prev, qm.MIN_QUANT_ELEMENTS = qm.MIN_QUANT_ELEMENTS, 0
                try:
                    with quant_context("int8"):
                        out = np.asarray(jfn(diff_params, noise_c, ctx_pair))
                finally:
                    qm.MIN_QUANT_ELEMENTS = prev
            else:
                out = np.asarray(jfn(diff_params, noise_c, ctx_pair))
            outs.append(out)
        return np.concatenate(outs, axis=0)

    def apply_base(params, lat, t, ctx_pair, **kw):
        n = lat.shape[0]
        return model.apply({"params": params}, lat, t, ctx_pair[:n], **kw)

    def ddim(steps, interval=None):
        def builder(params, noise_c, ctx_pair):
            return sample_latents(
                lambda lat, t: apply_base(params, lat, t, ctx_pair)[0],
                schedule, noise_c, jax.random.PRNGKey(8), steps,
                guidance_scale=GUIDANCE, guidance_rescale=0.0, eta=1.0,
                guidance_interval=interval)
        return builder

    def dpm(steps, layer_cache=None, interval=None, cfg_refresh=1):
        def builder(params, noise_c, ctx_pair):
            kw = {}
            if layer_cache is not None:
                k, m = layer_cache
                kw = dict(layer_cache_fns=(
                    lambda lat, t: apply_base(params, lat, t, ctx_pair,
                                              collect_deep_k=k)[0],
                    lambda lat, t, deep: apply_base(
                        params, lat, t, ctx_pair, deep_cache=(k, deep))[0]),
                    cache_interval=m)
            return dpm_solver_sample(
                lambda lat, t: apply_base(params, lat, t, ctx_pair)[0],
                schedule, noise_c, steps, guidance_scale=GUIDANCE,
                guidance_interval=interval,
                cfg_refresh_interval=cfg_refresh, **kw)
        return builder

    def ddim_lc(steps, k, m):
        def builder(params, noise_c, ctx_pair):
            return sample_latents_layer_cached(
                lambda lat, t: apply_base(params, lat, t, ctx_pair,
                                          collect_deep_k=k)[0],
                lambda lat, t, deep: apply_base(
                    params, lat, t, ctx_pair, deep_cache=(k, deep))[0],
                schedule, noise_c, jax.random.PRNGKey(8), steps,
                cache_interval=m, guidance_scale=GUIDANCE)
        return builder

    half = DEPTH // 2
    k_lc = min(2, half - 1)
    configs = [
        ("DDIM-100 (reference default)", ddim(100), {}),
        ("DDIM-50", ddim(50), {}),
        ("DPM-Solver++(2M)-25", dpm(25), {}),
        ("DPM-Solver++(2M)-10", dpm(10), {}),
        ("DDIM-100 + interval(100,900)", ddim(100, (100, 900)), {}),
        ("DDIM-100 + interval(300,800)", ddim(100, (300, 800)), {}),
        ("DDIM-100 int8 (all linears)", ddim(100), {"quant_int8": True}),
        # probe11's ~9% winner: bf16 softmax sits in the quality path, so
        # it only becomes a recommended default if this row holds FAD
        ("DDIM-100 attn=chunked_bf16", ddim(100),
         {"attn_impl": "chunked_bf16"}),
    ]
    if k_lc >= 1:  # layer caching needs half >= 2
        configs += [
            (f"DDIM-100 + layer_cache(k={k_lc},m=2)",
             ddim_lc(100, k_lc, 2), {}),
            (f"DDIM-100 + layer_cache(k={k_lc},m=4)",
             ddim_lc(100, k_lc, 4), {}),
            (f"DPM-25 + layer_cache(k={k_lc},m=2) (36x recipe)",
             dpm(25, (k_lc, 2)), {}),
            # the EXACT bench.py fast recipe (round 3): all three
            # approximations composed, so the "quality-validated" label on
            # the reported metric covers the composition, not just the
            # components
            (f"DPM-25 + lc({k_lc},2) + chunked_bf16 (bench fast recipe)",
             dpm(25, (k_lc, 2)), {"attn_impl": "chunked_bf16"}),
            (f"DPM-25 + lc({k_lc},2) + chunked_bf16 + int8 (max recipe)",
             dpm(25, (k_lc, 2)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            # guidance_interval composed into the fast recipe (round-3
            # dpm/lc gi support; band rounds outward to cache groups):
            # CFG only in-band halves the out-of-band model-call cost
            ("DPM-25 + interval(300,800)",
             dpm(25, interval=(300, 800)), {}),
            (f"DPM-25 + lc({k_lc},2) + interval(300,800)",
             dpm(25, (k_lc, 2), interval=(300, 800)), {}),
            (f"DPM-25 + lc({k_lc},2) + gi(300,800) + chunked_bf16 + int8"
             " (max+gi recipe)",
             dpm(25, (k_lc, 2), interval=(300, 800)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            # gi bought FAD headroom below the reference default — probe
            # whether it can buy FEWER STEPS instead (headline ~1/steps)
            # and whether (300,800) is the best band at this scale
            (f"DPM-20 + lc({k_lc},2) + gi(300,800) + bf16 + int8 (explore20)",
             dpm(20, (k_lc, 2), interval=(300, 800)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            (f"DPM-15 + lc({k_lc},2) + gi(300,800) + bf16 + int8 (explore15)",
             dpm(15, (k_lc, 2), interval=(300, 800)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            (f"DPM-25 + lc({k_lc},2) + gi(200,800) + bf16 + int8 (band200)",
             dpm(25, (k_lc, 2), interval=(200, 800)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            (f"DPM-25 + lc({k_lc},2) + gi(300,900) + bf16 + int8 (band900)",
             dpm(25, (k_lc, 2), interval=(300, 900)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            (f"DPM-25 + lc({k_lc},2) + gi(400,700) + bf16 + int8 (band47)",
             dpm(25, (k_lc, 2), interval=(400, 700)),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            # cfg_refresh (diffusion/dpm.py): uncond recomputed every P-th
            # in-band cache group, delta-reuse between — the in-band CFG
            # pair cost drops ~P-fold on reuse groups.  Rows with AND
            # without gi: the flagship-geometry run showed gi composed
            # with lc is past the quality bar at depth 24, so the no-gi
            # composition is the live headline candidate
            (f"DPM-25 + lc({k_lc},2) + gi(300,800) + cfgr2 (delta-reuse)",
             dpm(25, (k_lc, 2), interval=(300, 800), cfg_refresh=2), {}),
            (f"DPM-25 + lc({k_lc},2) + gi(300,800) + cfgr3 (delta-reuse)",
             dpm(25, (k_lc, 2), interval=(300, 800), cfg_refresh=3), {}),
            (f"DPM-25 + lc({k_lc},2) + gi(300,800) + cfgr2 + bf16 + int8"
             " (max+gi+cfgr2)",
             dpm(25, (k_lc, 2), interval=(300, 800), cfg_refresh=2),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
            (f"DPM-25 + lc({k_lc},2) + cfgr2 (no gi)",
             dpm(25, (k_lc, 2), cfg_refresh=2), {}),
            (f"DPM-25 + lc({k_lc},2) + cfgr3 (no gi)",
             dpm(25, (k_lc, 2), cfg_refresh=3), {}),
            (f"DPM-25 + lc({k_lc},2) + cfgr2 + bf16 + int8 (max+cfgr2,"
             " no gi)",
             dpm(25, (k_lc, 2), cfg_refresh=2),
             {"quant_int8": True, "attn_impl": "chunked_bf16"}),
        ]

    # MID_ROWS="substr1,substr2": run only rows whose name contains one of
    # the substrings (case-insensitive) — re-validation subsets reuse the
    # deterministic retrain instead of paying for the full table
    row_filter = E("MID_ROWS")
    if row_filter:
        pats = [p.strip().lower() for p in row_filter.split(",") if p.strip()]
        configs = [c for c in configs
                   if any(p in c[0].lower() for p in pats)]

    # ------------------------------------------------------------------
    # CLAP columns (the paper's metric family): decoded-audio CLAP score
    # + FAD over CLAP audio embeddings, reference side decoded through
    # the same fitted VAE
    # ------------------------------------------------------------------
    clap = None
    if RUN_CLAP:
        from scripts.mid_common import PROMPTS

        scorer, has_weights = make_clap_scorer()
        if not has_weights:
            print("[clap] random-init CLAP weights: CLAP columns are "
                  "RELATIVE-only (recipe-vs-anchor ordering within this "
                  "table; the audio tower still acts as a fixed random "
                  "projection, so CLAP-FAD is a valid distance) — NOT "
                  "literature-comparable absolute scores; set "
                  "MID_CLAP_WEIGHTS + MID_CLAP_TOKENIZER for those",
                  flush=True)

        def decode_wavs(lat_m):
            outs = []
            for i in range(0, len(lat_m), 8):
                z = jnp.asarray(lat_m[i : i + 8] * sd + mu)
                w = np.asarray(facade.decode(z), np.float32)
                if w.ndim == 3:
                    w = w[..., 0]
                outs.append(w)
            return np.concatenate(outs, 0)

        def clap_embed(lat_m):
            wavs = decode_wavs(lat_m)
            embs = []
            for i in range(0, len(wavs), 8):
                embs.append(np.asarray(
                    scorer.embed_audio(wavs[i : i + 8], sr_audio),
                    np.float32))
            return np.concatenate(embs, 0)

        t0c = time.time()
        clap_ref = clap_embed(lat_eval)
        text_emb = np.asarray(scorer.embed_text(PROMPTS), np.float32)
        clap = (clap_embed, text_emb, clap_ref)
        print(f"[clap] reference audio embeddings + text embeddings in "
              f"{time.time()-t0c:.0f}s", flush=True)

    rows = []

    def score(name, out):
        fad = frechet_audio_distance(features(out), feats_ref)
        acc = float((latent_class(out) == cls_eval).mean())
        if clap is not None:
            clap_embed, text_emb, clap_ref = clap
            emb = clap_embed(out)
            cscore = float((emb * text_emb[cls_eval]).sum(-1).mean())
            cfad = frechet_audio_distance(emb, clap_ref)
            rows.append((name, fad, acc, cscore, cfad))
            print(f"| {name} | {fad:.3f} | {acc:.2f} | {cscore:.4f} | "
                  f"{cfad:.4f} |", flush=True)
        else:
            rows.append((name, fad, acc))
            print(f"| {name} | {fad:.3f} | {acc:.2f} |", flush=True)

    if clap is not None:
        print("\n| sampler | FAD (latent feats) vs data | cond. class acc "
              "| CLAP score | CLAP-FAD |")
        print("|---|---|---|---|---|", flush=True)
    else:
        print("\n| sampler | FAD (latent feats) vs data | cond. class acc |")
        print("|---|---|---|", flush=True)
    for name, builder, kw in configs:
        score(name, run_config(builder, **kw))

    # ------------------------------------------------------------------
    # flow matching — its first quality rows (VERDICT r2 missing #5)
    # ------------------------------------------------------------------
    if RUN_FLOW:
        from ezaudio_tpu.diffusion.flow import FlowSchedule, flow_sample

        flow_params = train("flow", TRAIN_STEPS, seed=100)
        fsched = FlowSchedule()

        def flow_builder(steps):
            def builder(params, noise_c, ctx_pair):
                def model_fn(x, t):
                    n = x.shape[0]
                    out, _ = model.apply(
                        {"params": params}, x,
                        jnp.broadcast_to(t, (n,)), ctx_pair[:n])
                    return out
                return flow_sample(model_fn, fsched, noise_c, steps,
                                   guidance_scale=GUIDANCE)
            return builder

        for steps in (50, 25):
            jfn = jax.jit(flow_builder(steps))
            outs = []
            for i in range(0, N_EVAL, CHUNK):
                noise_c = jnp.asarray(noise_all[i : i + CHUNK])
                txt_c = jnp.asarray(txt_eval[i : i + CHUNK])
                ctx_pair = jnp.concatenate(
                    [txt_c, jnp.zeros_like(txt_c)], 0)
                outs.append(np.asarray(jfn(flow_params, noise_c, ctx_pair)))
            score(f"flow-matching Euler-{steps} + CFG",
                  np.concatenate(outs, 0))

    # ------------------------------------------------------------------
    # progressive distillation: 16 -> 8 -> 4, CFG distilled in at stage 1
    # ------------------------------------------------------------------
    if RUN_DISTILL:
        from ezaudio_tpu.diffusion.distill import (
            distill_tables, distilled_sample, make_distill_step)

        def student_apply(p, x, t, batch):
            t = jnp.broadcast_to(t, (x.shape[0],))
            out, _ = model.apply({"params": p}, x, t, batch["text"])
            return out

        def guided_builder(batch, t_params):
            def fn(x, t):
                t = jnp.broadcast_to(t, (x.shape[0],))
                pair = jnp.concatenate([x, x], axis=0)
                tp = jnp.concatenate([t, t], axis=0)
                ctx = jnp.concatenate(
                    [batch["text"], jnp.zeros_like(batch["text"])], axis=0)
                out, _ = model.apply({"params": t_params}, pair, tp, ctx)
                cond, unc = jnp.split(out, 2, axis=0)
                return unc + GUIDANCE * (cond - unc)
            return fn

        def plain_builder(batch, t_params):
            def fn(x, t):
                return student_apply(t_params, x, t, batch)
            return fn

        t_params = diff_params
        stage_params = {}
        rng = np.random.default_rng(7)
        for si, n_student in enumerate((8, 4)):
            tables = distill_tables(schedule, n_student)
            builder = guided_builder if si == 0 else plain_builder
            tx_s = make_optimizer(t_params, learning_rate=1e-4, warmup=100)
            st = TrainState.create(  # copy: the step donates state; t_params
                jax.tree.map(jnp.array, t_params), tx_s)  # doubles as teacher
            dstep = make_distill_step(student_apply, builder, schedule,
                                      tx_s, tables, teacher_params=t_params)
            t1 = time.time()
            for i in range(DISTILL_STEPS):
                idx = rng.integers(0, N_TRAIN, BATCH)
                batch = {"latents": jnp.asarray(lat_train[idx]),
                         "text": jnp.asarray(class_text(cls_train[idx]))}
                st, metrics = dstep(st, batch, jax.random.PRNGKey(50_000 + i))
                if i % 500 == 0 or i == DISTILL_STEPS - 1:
                    print(f"  [distill {16 >> si}->{n_student}] step {i}: "
                          f"loss {float(metrics['loss']):.5f} "
                          f"({time.time()-t1:.0f}s)", flush=True)
            t_params = st.params
            stage_params[n_student] = t_params

        for n_student in (8, 4):
            tables = distill_tables(schedule, n_student)

            def builder(params, noise_c, ctx_pair, tables=tables):
                def student_fn(x, t):
                    n = x.shape[0]
                    t = jnp.broadcast_to(t, (n,))
                    out, _ = model.apply({"params": params}, x, t,
                                         ctx_pair[:n])
                    return out
                return distilled_sample(student_fn, schedule, noise_c,
                                        tables)

            jfn = jax.jit(builder)
            outs = []
            for i in range(0, N_EVAL, CHUNK):
                noise_c = jnp.asarray(noise_all[i : i + CHUNK])
                txt_c = jnp.asarray(txt_eval[i : i + CHUNK])
                outs.append(np.asarray(jfn(
                    stage_params[n_student], noise_c, txt_c)))
            score(f"distilled-{n_student} (no CFG pair)",
                  np.concatenate(outs, 0))

    print("\nsummary rows:", len(rows))


if __name__ == "__main__":
    from scripts.busy_lock import busy_lock

    with busy_lock("quality_validate_mid", enabled=E("MID_CPU") != "1"):
        main()
