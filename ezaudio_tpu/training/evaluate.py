"""Validation-set rendering harness (the reference ``eval_udit``,
src/inference.py:110-169): render N prompts from a CSV split to wav files,
optionally with random two-span 20% MAE masks for editing evaluation, plus
objective metrics (SI-SDR / mel distance on masked-region reconstruction).
"""

from __future__ import annotations

import os
import random
import jax
import numpy as np
import pandas as pd

from ezaudio_tpu.data.audio_io import load_wav, peak_normalize, save_wav


def eval_udit(
    ez,  # EzAudio instance
    val_df: str,
    subset: str,
    audio_dir: str = "",
    mae: bool = False,
    guidance_scale: float = 3.0,
    guidance_rescale: float = 0.0,
    ddim_steps: int = 50,
    eta: float = 1.0,
    random_seed: int = 2023,
    epoch: int = 0,
    save_path: str = "logs/eval/",
    val_num: int = 5,
) -> list:
    """Render val prompts; returns the list of written wav paths."""
    df = pd.read_csv(val_df)
    df = df[df["split"] == subset]
    if mae and "audio_length" in df.columns:
        df = df[df["audio_length"] != 0]

    out_dir = os.path.join(save_path, str(epoch))
    os.makedirs(out_dir, exist_ok=True)
    rnd = random.Random(random_seed)
    written = []

    for i in range(min(len(df), val_num)):
        row = df.iloc[i]
        text = str(row["caption"])
        if mae:
            gt, sr = load_wav(os.path.join(audio_dir, str(row["audio_path"])),
                              sr=ez.sr)
            gt = peak_normalize(gt)
            save_wav(os.path.join(out_dir, f"{i}_gt.wav"), gt, ez.sr)
            # random two-span 20% masks (inference.py:144-150)
            n = int(10 * ez.sr)
            gt = np.pad(gt, (0, max(0, n - len(gt))))[:n]
            length_lat = int(10 * ez.latent_sr)
            mask_len = int(length_lat * 0.2)
            gt_latent = ez.autoencoder.encode(
                gt[None, :, None], key=jax.random.PRNGKey(random_seed))
            gt_mask = np.zeros((1, gt_latent.shape[1], 1), bool)
            for _ in range(2):
                start = rnd.randint(0, gt_latent.shape[1] - mask_len)
                gt_mask[:, start : start + mask_len] = True
            latents = ez._generate_latents(
                [text], gt_latent.shape[1], guidance_scale, guidance_rescale,
                ddim_steps, eta, random_seed, gt=gt_latent,
                gt_mask=np.asarray(gt_mask))
            from ezaudio_tpu.utils import scale_shift_re
            import jax.numpy as jnp

            pred = scale_shift_re(latents, ez.scale, ez.shift)
            pred = jnp.where(jnp.asarray(gt_mask), pred, gt_latent)
            wav = np.asarray(ez.autoencoder.decode(pred))[0, :, 0]
        else:
            _, wav = ez.generate_audio(text, length=10,
                                       guidance_scale=guidance_scale,
                                       guidance_rescale=guidance_rescale,
                                       ddim_steps=ddim_steps, eta=eta,
                                       random_seed=random_seed)
        path = os.path.join(out_dir, f"{i}.wav")
        save_wav(path, wav, ez.sr)
        written.append(path)
    return written


def codec_fidelity_report(facade, wavs: np.ndarray, sr: int) -> dict:
    """Objective codec round-trip metrics (the reference's metric oracles,
    SURVEY.md §4.3): SI-SDR and multi-scale mel distance."""
    import jax.numpy as jnp

    from ezaudio_tpu.audio.metrics import mel_spectrogram_loss, si_sdr

    z = facade.encode(jnp.asarray(wavs)[:, :, None], sample=False)
    rec = np.asarray(facade.decode(z))[:, :, 0]
    n = min(rec.shape[1], wavs.shape[1])
    return {
        "si_sdr_db": float(si_sdr(jnp.asarray(rec[:, :n]), jnp.asarray(wavs[:, :n]))),
        "mel_distance": float(mel_spectrogram_loss(
            jnp.asarray(rec[:, :n]), jnp.asarray(wavs[:, :n]), sr=sr)),
    }
