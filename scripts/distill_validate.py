"""Progressive-distillation validation on a TPU-trained tiny model.

Trains the same tiny conditional MaskDiT as quality_validate.py, then runs
two halving stages of progressive distillation (16 -> 8 -> 4 student
steps) with CFG distilled into the student, and scores each stage's
samples with the same Frechet-distance harness.  The distilled student
samples with NO CFG pair, so its per-step cost is HALF a guided DDIM
step's — distilled-4 costs ~2% of DDIM-100-with-CFG.

Run (TPU or CPU):  python -u scripts/distill_validate.py [teacher_steps]
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

from quality_validate import L, C, Lc, D, N_CLASS, make_batch, features  # noqa: E402


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    distill_steps = int(os.environ.get("DISTILL_STEPS", "4000"))
    guidance = 3.0

    from ezaudio_tpu.audio.metrics import frechet_audio_distance
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.distill import (
        distill_tables, distilled_sample, make_distill_step)
    from ezaudio_tpu.diffusion.sampling import sample_latents
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.optim import make_optimizer
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

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
        if i % 1000 == 0 or i == train_steps - 1:
            print(f"teacher step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    teacher_params = state.params

    # ------------------------------------------------------------------
    # progressive distillation stages: 16 -> 8 -> 4 (CFG distilled in)
    # ------------------------------------------------------------------
    def student_apply(p, x, t, batch):
        t = jnp.broadcast_to(t, (x.shape[0],))
        out, _ = model.apply({"params": p}, x, t, batch["text"])
        return out

    def make_teacher_builder(w):
        """Guided teacher: cond/uncond pair; teacher params arrive as a
        jit argument (not closure constants — CLAUDE.md probe8 lesson)."""
        def builder(batch, t_params):
            def fn(x, t):
                t = jnp.broadcast_to(t, (x.shape[0],))
                pair = jnp.concatenate([x, x], axis=0)
                tp = jnp.concatenate([t, t], axis=0)
                ctx = jnp.concatenate(
                    [batch["text"],
                     jnp.zeros_like(batch["text"])], axis=0)
                out, _ = model.apply({"params": t_params}, pair, tp, ctx)
                cond, unc = jnp.split(out, 2, axis=0)
                return unc + w * (cond - unc)
            return fn
        return builder

    def make_plain_builder():
        """Unguided teacher (later stages distill the already-guided
        student, so no CFG pair is needed)."""
        def builder(batch, t_params):
            def fn(x, t):
                return student_apply(t_params, x, t, batch)
            return fn
        return builder

    stage_params = {}
    t_params = teacher_params
    for si, n_student in enumerate((8, 4)):
        tables = distill_tables(schedule, n_student)
        builder = (make_teacher_builder(guidance) if si == 0
                   else make_plain_builder())
        tx_s = make_optimizer(t_params, learning_rate=1e-4, warmup=100)
        st = TrainState.create(  # copy: the step donates state; t_params
            jax.tree.map(jnp.array, t_params), tx_s)  # doubles as teacher
        dstep = make_distill_step(student_apply, builder, schedule, tx_s,
                                  tables, teacher_params=t_params)
        t0 = time.time()
        for i in range(distill_steps):
            lat, txt, _ = make_batch(rng, B)
            batch = {"latents": jnp.asarray(lat), "text": jnp.asarray(txt)}
            st, metrics = dstep(st, batch, jax.random.PRNGKey(10_000 + i))
            if i % 1000 == 0 or i == distill_steps - 1:
                print(f"stage {16 >> si}->{n_student} step {i}: "
                      f"loss {float(metrics['loss']):.5f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        t_params = st.params
        stage_params[n_student] = t_params

    # ------------------------------------------------------------------
    # evaluation: FAD vs the data distribution (same harness/seeds as
    # quality_validate.py)
    # ------------------------------------------------------------------
    N_EVAL = 256
    lat_ref, txt_eval, cls_eval = make_batch(rng, N_EVAL)
    feats_ref = features(lat_ref)
    ctx = jnp.concatenate([jnp.asarray(txt_eval),
                           jnp.zeros((N_EVAL, Lc, D))], axis=0)
    noise = jax.random.normal(jax.random.PRNGKey(7), (N_EVAL, L, C))

    def teacher_model_fn(latents, t):
        n = latents.shape[0]
        out, _ = model.apply({"params": teacher_params}, latents, t,
                             ctx[: 2 * N_EVAL][:n])
        return out

    configs = {
        "teacher DDIM-100 + CFG (reference recipe)": lambda: sample_latents(
            teacher_model_fn, schedule, noise, jax.random.PRNGKey(8), 100,
            guidance_scale=guidance, guidance_rescale=0.0, eta=1.0),
        "teacher DDIM-16 + CFG": lambda: sample_latents(
            teacher_model_fn, schedule, noise, jax.random.PRNGKey(8), 16,
            guidance_scale=guidance, guidance_rescale=0.0, eta=1.0),
    }
    for n_student in (8, 4):
        p = stage_params[n_student]
        tables = distill_tables(schedule, n_student)

        def student_fn(x, t, p=p):
            t = jnp.broadcast_to(t, (x.shape[0],))
            out, _ = model.apply({"params": p}, x, t,
                                 jnp.asarray(txt_eval))
            return out

        configs[f"distilled-{n_student} (no CFG pair)"] = (
            lambda student_fn=student_fn, tables=tables: distilled_sample(
                student_fn, schedule, noise, tables))

    print("\n| sampler | FAD (latent feats) vs data | cond. acc | "
          "model calls / sample |")
    print("|---|---|---|---|")
    calls = {"teacher DDIM-100 + CFG (reference recipe)": 200,
             "teacher DDIM-16 + CFG": 32,
             "distilled-8 (no CFG pair)": 8,
             "distilled-4 (no CFG pair)": 4}
    for name, fn in configs.items():
        out = np.asarray(jax.jit(lambda fn=fn: fn())())
        fad = frechet_audio_distance(features(out), feats_ref)
        spec = np.abs(np.fft.rfft(out.mean(-1), axis=1))
        spec[:, 0] = 0
        khat = np.clip(np.argmax(spec[:, 1 : N_CLASS + 1], axis=1), 0,
                       N_CLASS - 1)
        acc = float((khat == cls_eval).mean())
        print(f"| {name} | {fad:.3f} | {acc:.2f} | {calls[name]} |",
              flush=True)


if __name__ == "__main__":
    main()
