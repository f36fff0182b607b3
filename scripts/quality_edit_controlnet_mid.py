"""Editing (inpainting) and ControlNet quality rows on the trained
mid-scale model (VERDICT r3 item 3: all 19 r3 quality rows were t2a —
the editing paste path and the energy-ControlNet had parity tests but no
quality measurement).

Editing rows (public ``ez.editing_audio``, the reference's
``src/inference.py:104-105`` paste behavior):
  * mask-region FAD: latent features of the regenerated region vs the
    reference distribution's same region (decode->encode roundtrip
    applied to the reference side too);
  * in-mask conditional accuracy with a CLASS-CHANGING edit (gt clip is
    class a, edit prompt class b != a — the readout must hear b inside
    the mask);
  * out-of-mask preservation error vs the gt roundtrip (the paste);
  * boundary-seam energy discontinuity (dB step across the mask edges)
    vs two baselines: the gt's own continuity (floor) and a naive
    cross-clip splice (ceiling).

ControlNet rows (the reference's stated purpose for the branch,
``api/controlnet.py:140-142``): train the mid-scale energy ControlNet
(training/controlnet_trainer.py) on conditioner curves of the training
audio, then report Pearson r between the requested energy curve and the
generated audio's energy curve, against the no-ControlNet t2a baseline.

Run (TPU): python -u scripts/quality_edit_controlnet_mid.py
Env knobs: QC_DEPTH [12] QC_DIM [512] QC_HEADS [8] QC_FRAMES [500]
QC_TRAIN_STEPS [4000] QC_BATCH [16] QC_N_TRAIN [1024] QC_CN_STEPS [1500]
QC_N_CN_TRAIN [512] QC_N_EDIT [48] QC_N_CN_EVAL [32] QC_EDIT_STEPS [50]
CPU smoke (FRAMES stays 500: the ControlNet API generates fixed 10 s
clips, api/controlnet.py): QC_CPU=1 QC_DEPTH=2 QC_DIM=64 QC_TRAIN_STEPS=30
  QC_CN_STEPS=20 QC_N_TRAIN=24 QC_N_EDIT=4 QC_N_CN_TRAIN=8 QC_N_CN_EVAL=2
  QC_EDIT_STEPS=4
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("QC_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
    # CPU smokes recompile everything on a 1-core pool VM — persist
    # compiles like the TPU path does (own subdir: CPU executables are
    # keyed by host CPU model, tests/.jax_cache fingerprint lesson)
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", "qc_cpu")
else:
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

E = os.environ.get
DEPTH = int(E("QC_DEPTH", "12"))
DIM = int(E("QC_DIM", "512"))
HEADS = int(E("QC_HEADS", "8"))
FRAMES = int(E("QC_FRAMES", "500"))
TRAIN_STEPS = int(E("QC_TRAIN_STEPS", "4000"))
BATCH = int(E("QC_BATCH", "16"))
N_TRAIN = int(E("QC_N_TRAIN", "1024"))
CN_STEPS = int(E("QC_CN_STEPS", "1500"))
N_CN_TRAIN = int(E("QC_N_CN_TRAIN", "512"))
N_EDIT = int(E("QC_N_EDIT", "48"))
N_CN_EVAL = int(E("QC_N_CN_EVAL", "32"))
EDIT_STEPS = int(E("QC_EDIT_STEPS", "50"))
VAE_STEPS = int(E("QC_VAE_STEPS", "1500"))

from scripts.mid_common import (  # noqa: E402
    GUIDANCE, PROMPTS, build_mid_ezaudio, fit_vae, peak_wav, prepare_data,
    roundtrip_latents, train_teacher)
from scripts.quality_validate_mid import (  # noqa: E402
    features, latent_class, synth_clip)


def seam_db(m, m0, m1, w=10):
    """Mean |energy step| (dB) across the two mask edges, per sample."""
    e = (np.asarray(m, np.float64) ** 2).mean(-1) + 1e-9  # (B, L)

    def step(at):
        left = e[:, at - w : at].mean(1)
        right = e[:, at : at + w].mean(1)
        return np.abs(10 * np.log10(right) - 10 * np.log10(left))

    return 0.5 * (step(m0) + step(m1))


def pearson(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum()
                 / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main():  # noqa: C901 — linear experiment script
    from ezaudio_tpu.api.controlnet import EzAudioControlNet
    from ezaudio_tpu.audio.metrics import frechet_audio_distance
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.training.controlnet_trainer import (
        make_controlnet_train_step)

    ez, cfg, model_cfg, _ = build_mid_ezaudio(DEPTH, DIM, HEADS, FRAMES,
                                              with_controlnet=True)
    fit_vae(ez, steps=VAE_STEPS)
    sr, latent_sr = ez.sr, ez.latent_sr
    ratio = sr // latent_sr
    length_s = FRAMES / latent_sr
    data = prepare_data(ez, FRAMES, N_TRAIN, max(N_EDIT, 32))
    mu, sd = data["mu"], data["sd"]
    train_teacher(ez, model_cfg, data, TRAIN_STEPS, BATCH)
    schedule = DDIMSchedule.from_config(cfg["diff"])

    def enc(wavs):
        zs = []
        for i in range(0, len(wavs), 8):
            zs.append(np.asarray(ez.autoencoder.encode(
                jnp.asarray(wavs[i : i + 8, :, None]), sample=False),
                np.float32))
        return (np.concatenate(zs, 0) - mu) / sd

    # ------------------------------------------------------------------
    # EDITING rows (QC_SKIP_EDIT=1 jumps straight to the ControlNet
    # phase — the editing rows are deterministic given the cached
    # VAE/teacher, so a completed earlier run's rows stay valid)
    # ------------------------------------------------------------------
    # mask the middle 40%
    mask_start_s = 0.3 * length_s
    mask_len_s = 0.4 * length_s
    m0 = int(mask_start_s * latent_sr)
    m1 = m0 + int(mask_len_s * latent_sr)

    def run_edits(gt_cls, edit_cls, seed0, gt_wavs=None, crossfade=0.0):
        if gt_wavs is None:
            gt_wavs = np.stack(
                [peak_wav(synth_clip(rng, int(c), FRAMES * ratio, sr))
                 for c in gt_cls])
        t0 = time.time()
        edited = []
        for i in range(len(gt_cls)):
            _, w = ez.editing_audio(
                PROMPTS[int(edit_cls[i])], boundary=0.08 * length_s,
                gt_file=gt_wavs[i], mask_start=mask_start_s,
                mask_length=mask_len_s, ddim_steps=EDIT_STEPS,
                guidance_scale=GUIDANCE, random_seed=seed0 + i,
                crossfade=crossfade)
            edited.append(np.asarray(w, np.float32)[: gt_wavs.shape[1]])
        print(f"edited {len(gt_cls)} clips in {time.time()-t0:.0f}s"
              + (f" (crossfade {crossfade:.3f}s)" if crossfade else ""),
              flush=True)
        return enc(np.stack(edited)), enc(gt_wavs), gt_wavs

    if os.environ.get("QC_SKIP_EDIT") != "1":
        # class-CHANGING edits on fresh gt clips (the readout must hear
        # the new class inside the mask)
        rng = np.random.default_rng(2)
        gt_cls = rng.integers(0, len(PROMPTS), N_EDIT)
        edit_cls = (gt_cls + 1 + rng.integers(0, len(PROMPTS) - 1, N_EDIT)) \
            % len(PROMPTS)
        m_edit, m_gt, gt_wavs = run_edits(gt_cls, edit_cls, seed0=0)

        # region FAD vs the reference distribution's same region (roundtrip
        # both sides: m_edit came through decode->encode by construction)
        ref_rt = roundtrip_latents(ez, data["m_eval"], mu, sd)
        fad_region = frechet_audio_distance(
            features(m_edit[:, m0:m1]), features(ref_rt[:, m0:m1]))
        acc_edit = float(
            (latent_class(m_edit[:, m0:m1]) == edit_cls).mean())
        acc_gt_region = float(
            (latent_class(m_gt[:, m0:m1]) == gt_cls).mean())
        # out-of-mask preservation: the paste must keep gt (up to VAE
        # roundtrip noise, whose scale the gt roundtrip itself sets)
        out_mask = np.ones(FRAMES, bool)
        out_mask[m0:m1] = False
        bnd = int(0.08 * length_s * latent_sr) + 2
        out_mask[max(0, m0 - bnd) : m0] = False  # boundary band re-noised
        out_mask[m1 : m1 + bnd] = False
        pres_err = float(
            np.abs(m_edit[:, out_mask] - m_gt[:, out_mask]).mean())
        gt_scale = float(np.abs(m_gt[:, out_mask]).mean())

        # seam: edited vs gt continuity floor vs naive-splice ceiling.
        # A class-changing edit legitimately steps in energy (the new
        # class has a different envelope), so ALSO measure same-class
        # edits, where a working seam should sit near the gt floor.
        seam_edit = seam_db(m_edit, m0, m1)
        seam_gt = seam_db(m_gt, m0, m1)
        spliced = m_gt.copy()
        spliced[:, m0:m1] = np.roll(m_gt[:, m0:m1], 1, axis=0)  # other clip
        seam_splice = seam_db(spliced, m0, m1)

        # CLASS-MATCHED splice control (VERDICT r4 item 5): splice real
        # clips of the TARGET class into the mask — the content changes
        # exactly as the edit asks, but there is no generative seam.  The
        # gap between the generated seam and THIS floor is the artifact
        # component; the gap between this floor and the gt floor is the
        # legitimate content-change component.
        tgt_wavs = np.stack(
            [peak_wav(synth_clip(rng, int(c), FRAMES * ratio, sr))
             for c in edit_cls])
        m_tgt = enc(tgt_wavs)
        spliced_cm = m_gt.copy()
        spliced_cm[:, m0:m1] = m_tgt[:, m0:m1]
        seam_splice_cm = seam_db(spliced_cm, m0, m1)

        # crossfade A/B: same gt clips, same seeds — only the paste
        # differs (editing_audio crossfade=).  Measures whether a short
        # latent-boundary blend cuts the artifact component without
        # hurting in-mask accuracy or out-of-mask preservation.
        xf_s = float(E("QC_XFADE", "0.06"))
        m_xf, _, _ = run_edits(gt_cls, edit_cls, seed0=0, gt_wavs=gt_wavs,
                               crossfade=xf_s)
        seam_xf = seam_db(m_xf, m0, m1)
        acc_xf = float((latent_class(m_xf[:, m0:m1]) == edit_cls).mean())

        n_same = int(E("QC_N_SAME", str(max(8, N_EDIT // 2))))
        same_cls = rng.integers(0, len(PROMPTS), n_same)
        m_same, m_same_gt, _ = run_edits(same_cls, same_cls, seed0=1000)
        seam_same = seam_db(m_same, m0, m1)
        seam_same_gt = seam_db(m_same_gt, m0, m1)
        acc_same = float(
            (latent_class(m_same[:, m0:m1]) == same_cls).mean())

        print("\n| editing metric | value | baseline |")
        print("|---|---|---|")
        print(f"| mask-region FAD vs data | {fad_region:.3f} | — |")
        print(f"| in-mask edit-class accuracy | {acc_edit:.2f} | "
              f"gt-region readout {acc_gt_region:.2f} |")
        print(f"| out-of-mask preservation err | {pres_err:.4f} | "
              f"gt level {gt_scale:.4f} |")
        print(f"| seam energy step, class-changing (dB) | "
              f"{float(seam_edit.mean()):.2f} | "
              f"gt floor {float(seam_gt.mean()):.2f} / naive splice "
              f"{float(seam_splice.mean()):.2f} |")
        print(f"| seam, class-MATCHED splice floor (dB) | "
              f"{float(seam_splice_cm.mean()):.2f} | content-change "
              f"component; artifact = edited - this |")
        pres_xf = float(np.abs(m_xf[:, out_mask] - m_gt[:, out_mask]).mean())
        print(f"| seam, class-changing + crossfade {xf_s:.2f}s (dB) | "
              f"{float(seam_xf.mean()):.2f} | in-mask acc {acc_xf:.2f} "
              f"(vs {acc_edit:.2f}); out-of-mask err {pres_xf:.4f} |")
        print(f"| seam energy step, same-class (dB) | "
              f"{float(seam_same.mean()):.2f} | "
              f"gt floor {float(seam_same_gt.mean()):.2f}; in-mask acc "
              f"{acc_same:.2f} |", flush=True)

    # ------------------------------------------------------------------
    # CONTROLNET rows (QC_SKIP_CN=1 stops here — re-runs that only need
    # the editing/seam rows skip the ControlNet retrain+eval; the r4
    # ControlNet rows stand, docs/evidence/r4rb_qc.log)
    # ------------------------------------------------------------------
    if os.environ.get("QC_SKIP_CN") == "1":
        return
    cn_api = EzAudioControlNet(base=ez)
    conditioner = cn_api.conditioner

    rng = np.random.default_rng(3)
    cn_cls = rng.integers(0, len(PROMPTS), N_CN_TRAIN)
    t0 = time.time()
    cn_wavs = np.stack([peak_wav(synth_clip(rng, int(c), FRAMES * ratio, sr))
                        for c in cn_cls])
    cn_lat = enc(cn_wavs)
    cn_cond = np.asarray(conditioner(cn_wavs), np.float32)
    print(f"controlnet training data: {cn_lat.shape} latents, "
          f"{cn_cond.shape} conditions ({time.time()-t0:.0f}s)", flush=True)

    init_fn, step_fn = make_controlnet_train_step(
        ez.dit, cn_api.controlnet, schedule, ez.dit_params["params"],
        learning_rate=2e-4, warmup=100)
    state = init_fn(cn_api.cn_params["params"])
    t1 = time.time()
    for i in range(CN_STEPS):
        idx = rng.integers(0, N_CN_TRAIN, BATCH)
        batch = {"latents": jnp.asarray(cn_lat[idx]),
                 "condition": jnp.asarray(cn_cond[idx]),
                 "text": jnp.asarray(data["cond_emb"][cn_cls[idx]]),
                 "text_mask": jnp.asarray(data["cond_mask"][cn_cls[idx]])}
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        if i % 500 == 0 or i == CN_STEPS - 1:
            print(f"  [controlnet] step {i}: "
                  f"loss {float(metrics['loss']):.4f} "
                  f"({time.time()-t1:.0f}s)", flush=True)
    cn_api.cn_params = {"params": state.cn_params}

    # eval: energy fidelity r on held-out reference audio
    rng = np.random.default_rng(4)
    ev_cls = rng.integers(0, len(PROMPTS), N_CN_EVAL)
    ev_wavs = np.stack([peak_wav(synth_clip(rng, int(c), FRAMES * ratio, sr))
                        for c in ev_cls])
    r_cn, r_base = [], []
    for i in range(N_CN_EVAL):
        prompt = PROMPTS[int(ev_cls[i])]
        target = np.asarray(conditioner(ev_wavs[i][None]))[0, :, 0]
        _, w_cn = cn_api.generate_audio(
            prompt, ev_wavs[i], ddim_steps=EDIT_STEPS,
            guidance_scale=GUIDANCE, conditioning_scale=1.0, random_seed=i)
        got = np.asarray(conditioner(
            np.asarray(w_cn, np.float32)[None, : ev_wavs.shape[1]]))[0, :, 0]
        r_cn.append(pearson(target, got[: len(target)]))
        _, w_t2a = ez.generate_audio(
            prompt, length=length_s, ddim_steps=EDIT_STEPS,
            guidance_scale=GUIDANCE, random_seed=i)
        got0 = np.asarray(conditioner(
            np.asarray(w_t2a, np.float32)[None, : ev_wavs.shape[1]]))[0, :, 0]
        r_base.append(pearson(target, got0[: len(target)]))

    print("\n| controlnet metric | value | baseline (no controlnet) |")
    print("|---|---|---|")
    print(f"| energy-curve Pearson r (mean over {N_CN_EVAL}) | "
          f"{float(np.mean(r_cn)):.3f} | {float(np.mean(r_base)):.3f} |")
    print(f"| energy-curve Pearson r (median) | "
          f"{float(np.median(r_cn)):.3f} | {float(np.median(r_base)):.3f} |",
          flush=True)


if __name__ == "__main__":
    from scripts.busy_lock import busy_lock

    with busy_lock("quality_edit_controlnet_mid",
                   enabled=os.environ.get("QC_CPU") != "1"):
        main()
