"""Diffusion training loss.

Parity target: ``compute_loss`` (reference src/train.py:139-167):
masked MSE normalized per-sample by mask area, optional min-SNR-gamma
weighting (arXiv 2303.09556; for v-prediction the weight is
``min(snr, gamma) / (snr + 1)``), mean over the batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ezaudio_tpu.diffusion.ddim import DDIMSchedule


def masked_diffusion_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    schedule: DDIMSchedule,
    timesteps: jnp.ndarray,
    snr_gamma: Optional[float] = None,
) -> jnp.ndarray:
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    err = err * mask.astype(jnp.float32)
    per_sample = err.sum(axis=(1, 2)) / jnp.maximum(mask.sum(axis=(1, 2)), 1.0)
    if snr_gamma is not None:
        snr = schedule.snr(timesteps)
        w = jnp.minimum(snr, snr_gamma)
        if schedule.prediction_type == "epsilon":
            # zero-terminal-SNR schedules make snr(T-1) exactly 0; clamp so
            # the uniformly-sampled terminal step can't NaN the batch loss
            w = w / jnp.maximum(snr, 1e-8)
        elif schedule.prediction_type == "v_prediction":
            w = w / (snr + 1.0)
        else:
            raise NotImplementedError(schedule.prediction_type)
        per_sample = per_sample * w
    return per_sample.mean()
