"""Train, distill, SAVE, reload and SERVE a mid-scale student end-to-end
(VERDICT r3 item 6: the 118 audio-s/s distilled headline was throughput
with random weights; no student had ever been trained and served through
``GenerationServer``).

Pipeline, all through the PUBLIC product surfaces:
  1. build a mid-scale ``EzAudio`` (depth 12 / dim 512, production
     Oobleck VAE geometry from configs/vae.json, tiny random T5) —
     conditioning is the REAL prompt->tokenizer->T5 path, so serving
     reproduces training conditioning exactly (scripts/mid_common.py);
  2. synthesize the 4-class audio distribution, encode through
     ``ez.autoencoder``; train the DiT teacher;
  3. progressively distill 16 -> 8 -> 4 with CFG folded in at stage 1
     (diffusion/distill.py);
  4. ``save_model`` the student, ``load_model`` it back, inject into the
     EzAudio;
  5. serve BOTH the teacher (DDIM-100 + CFG) and the student
     (sampler='distilled', 4 calls, no CFG) through ``GenerationServer``
     with identical prompts/seeds; score latent-feature FAD on the
     re-encoded served audio (decode->encode roundtrip applied to the
     reference side too) and report serving throughput.

Run (TPU): python -u scripts/distill_serve_mid.py
Env knobs: DS_TRAIN_STEPS [4000] DS_DISTILL_STEPS [1500] DS_BATCH [16]
DS_N_TRAIN [1024] DS_N_EVAL [128] DS_DEPTH [12] DS_DIM [512] DS_HEADS [8]
DS_CKPT [/tmp/ds_student_ckpt] DS_SERVE_BATCH [16]
CPU smoke: DS_CPU=1 DS_DEPTH=2 DS_DIM=64 DS_FRAMES=50 DS_TRAIN_STEPS=30
           DS_DISTILL_STEPS=20 DS_N_TRAIN=32 DS_N_EVAL=16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("DS_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

E = os.environ.get
DEPTH = int(E("DS_DEPTH", "12"))
DIM = int(E("DS_DIM", "512"))
HEADS = int(E("DS_HEADS", "8"))
FRAMES = int(E("DS_FRAMES", "500"))
TRAIN_STEPS = int(E("DS_TRAIN_STEPS", "4000"))
DISTILL_STEPS = int(E("DS_DISTILL_STEPS", "1500"))
BATCH = int(E("DS_BATCH", "16"))
N_TRAIN = int(E("DS_N_TRAIN", "1024"))
N_EVAL = int(E("DS_N_EVAL", "128"))
SERVE_BATCH = int(E("DS_SERVE_BATCH", "16"))
VAE_STEPS = int(E("DS_VAE_STEPS", "1500"))

from scripts.busy_lock import busy_lock  # noqa: E402
from scripts.mid_common import (  # noqa: E402
    CACHE_ROOT, GUIDANCE, PROMPTS, _load_params, _save_params,
    build_mid_ezaudio, fit_vae, prepare_data, train_teacher)

CKPT = E("DS_CKPT", os.path.join(CACHE_ROOT, "ds_student_ckpt"))
from scripts.quality_validate_mid import features, latent_class  # noqa: E402


def main():  # noqa: C901 — linear experiment script
    from ezaudio_tpu.audio.metrics import frechet_audio_distance
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.distill import distill_tables, make_distill_step
    from ezaudio_tpu.serving import GenerationServer
    from ezaudio_tpu.training.model_io import load_model, save_model
    from ezaudio_tpu.training.optim import make_optimizer
    from ezaudio_tpu.training.trainer import TrainState

    ez, cfg, model_cfg, _ = build_mid_ezaudio(DEPTH, DIM, HEADS, FRAMES)
    fit_vae(ez, steps=VAE_STEPS)
    sr, latent_sr = ez.sr, ez.latent_sr
    length_s = FRAMES / latent_sr
    data = prepare_data(ez, FRAMES, N_TRAIN, N_EVAL)
    mu, sd = data["mu"], data["sd"]
    cls_eval, m_eval = data["cls_eval"], data["m_eval"]

    model = ez.dit
    schedule = DDIMSchedule.from_config(cfg["diff"])
    teacher_params = train_teacher(ez, model_cfg, data, TRAIN_STEPS, BATCH)

    # ------------------------------------------------------------------
    # progressive distillation 16 -> 8 -> 4 (CFG folded in at stage 1)
    # ------------------------------------------------------------------
    unc_emb, unc_mask = data["unc_emb"], data["unc_mask"]

    def student_apply(p, x, t, batch):
        t = jnp.broadcast_to(t, (x.shape[0],))
        out, _ = model.apply({"params": p}, x, t, batch["text"],
                             context_mask=batch.get("text_mask"))
        return out

    def guided_builder(batch, t_params):
        def fn(x, t):
            t = jnp.broadcast_to(t, (x.shape[0],))
            pair = jnp.concatenate([x, x], axis=0)
            tp = jnp.concatenate([t, t], axis=0)
            B = x.shape[0]
            ctx = jnp.concatenate(
                [batch["text"],
                 jnp.broadcast_to(jnp.asarray(unc_emb),
                                  (B,) + unc_emb.shape[1:])], axis=0)
            cm = jnp.concatenate(
                [batch["text_mask"],
                 jnp.broadcast_to(jnp.asarray(unc_mask),
                                  (B,) + unc_mask.shape[1:])], axis=0)
            out, _ = model.apply({"params": t_params}, pair, tp, ctx,
                                 context_mask=cm)
            cond, unc = jnp.split(out, 2, axis=0)
            return unc + GUIDANCE * (cond - unc)
        return fn

    def plain_builder(batch, t_params):
        def fn(x, t):
            return student_apply(t_params, x, t, batch)
        return fn

    t_params = teacher_params
    rng = np.random.default_rng(7)
    for si, n_student in enumerate((8, 4)):
        # per-stage disk checkpoint: a tunnel outage mid-run resumes at
        # the last completed stage instead of zeroing hours of work (the
        # r4 run died at stage-1 step 0 and lost everything)
        stage_dir = os.path.join(
            CACHE_ROOT, "ds_stages",
            f"d{DEPTH}_w{DIM}_L{FRAMES}_t{TRAIN_STEPS}"
            f"_ds{DISTILL_STEPS}_b{BATCH}_to{n_student}")
        if os.path.exists(os.path.join(stage_dir, "params.npz")):
            cached, _ = _load_params(stage_dir)
            t_params = jax.tree.map(jnp.asarray, cached)
            print(f"  [distill ->{n_student}] reusing cached stage: "
                  f"{stage_dir}", flush=True)
            continue
        tables = distill_tables(schedule, n_student)
        builder = guided_builder if si == 0 else plain_builder
        tx_s = make_optimizer(t_params, learning_rate=1e-4, warmup=100)
        st = TrainState.create(  # copy: the step donates state; t_params
            jax.tree.map(jnp.array, t_params), tx_s)  # doubles as teacher
        dstep = make_distill_step(student_apply, builder, schedule, tx_s,
                                  tables, teacher_params=t_params)
        t1 = time.time()
        n_train = len(data["m_train"])
        for i in range(DISTILL_STEPS):
            idx = rng.integers(0, n_train, BATCH)
            batch = {
                "latents": jnp.asarray(data["m_train"][idx]),
                "text": jnp.asarray(data["cond_emb"][data["cls_train"][idx]]),
                "text_mask": jnp.asarray(
                    data["cond_mask"][data["cls_train"][idx]])}
            st, metrics = dstep(st, batch, jax.random.PRNGKey(50_000 + i))
            if i % 25 == 0:
                # backpressure: never let the host enqueue unboundedly far
                # ahead of the tunnel device (r4 OOM lesson, see distill.py)
                jax.block_until_ready(metrics["loss"])
            if i % 500 == 0 or i == DISTILL_STEPS - 1:
                print(f"  [distill {16 >> si}->{n_student}] step {i}: "
                      f"loss {float(metrics['loss']):.5f} "
                      f"({time.time()-t1:.0f}s)", flush=True)
        t_params = st.params
        _save_params(stage_dir, jax.device_get(t_params),
                     {"stage": n_student, "steps": DISTILL_STEPS})
        print(f"  [distill ->{n_student}] stage cached: {stage_dir}",
              flush=True)
    student_params = t_params

    # ------------------------------------------------------------------
    # save -> reload -> inject (checkpoint roundtrip is part of the claim)
    # ------------------------------------------------------------------
    save_model(CKPT, "maskdit", {"model": model_cfg}, student_params,
               extra_metadata={"distilled_steps": 4, "guidance": GUIDANCE,
                               "latent_mu": mu, "latent_sd": sd})
    _, loaded, meta = load_model(CKPT)
    print(f"student checkpoint saved+reloaded: {CKPT} "
          f"(metadata {meta})", flush=True)

    # ------------------------------------------------------------------
    # serve teacher and student through GenerationServer
    # ------------------------------------------------------------------
    def roundtrip_features(lat_m):
        """model-space latents -> decode -> audio -> encode -> features
        (the reference side passes through the same decode/encode)."""
        outs = []
        for i in range(0, len(lat_m), 8):
            z = lat_m[i : i + 8] * sd + mu
            wav = np.asarray(ez.autoencoder.decode(jnp.asarray(z)))
            if wav.ndim == 2:
                wav = wav[:, :, None]
            z2 = ez.autoencoder.encode(jnp.asarray(wav), sample=False)
            outs.append(np.asarray(z2, np.float32))
        rt = (np.concatenate(outs, 0) - mu) / sd
        return features(rt)

    feats_ref = roundtrip_features(m_eval)
    print(f"ref roundtrip feature spread: {float(feats_ref.std(0).mean()):.4f}"
          f" (0 would make FAD degenerate)", flush=True)

    def serve_and_score(tag, **server_kw):
        prompts = [PROMPTS[c] for c in cls_eval]
        wavs = np.zeros((N_EVAL, int(length_s * sr)), np.float32)
        t0 = time.time()
        with GenerationServer(ez, max_batch_size=SERVE_BATCH,
                              length=length_s, **server_kw) as srv:
            futs = [srv.submit(p, seed=i) for i, p in enumerate(prompts)]
            for i, f in enumerate(futs):
                _, w = f.result(timeout=3600)
                wavs[i, : len(w)] = w[: wavs.shape[1]]
        wall = time.time() - t0
        thr = N_EVAL * length_s / wall
        z = []
        for i in range(0, N_EVAL, 8):
            z.append(np.asarray(ez.autoencoder.encode(
                jnp.asarray(wavs[i : i + 8, :, None]), sample=False),
                np.float32))
        m_gen = (np.concatenate(z, 0) - mu) / sd
        fad = frechet_audio_distance(features(m_gen), feats_ref)
        acc = float((latent_class(m_gen) == cls_eval).mean())
        print(f"| {tag} | {fad:.3f} | {acc:.2f} | {thr:.2f} | {wall:.1f} |",
              flush=True)
        return fad, acc, thr

    print("\n| served config | FAD (roundtrip latent feats) | cond acc | "
          "audio-s/s | wall s |")
    print("|---|---|---|---|---|", flush=True)
    ez.dit_params = {"params": teacher_params}
    serve_and_score("teacher DDIM-100 + CFG (served)",
                    ddim_steps=100, guidance_scale=GUIDANCE,
                    guidance_rescale=0.0)
    ez.dit_params = {"params": loaded}
    serve_and_score("distilled-4 student from RELOADED ckpt (served)",
                    sampler="distilled", ddim_steps=4)


if __name__ == "__main__":
    with busy_lock("distill_serve_mid", enabled=E("DS_CPU") != "1"):
        main()
