"""DDIM noise schedule and step — closed-form tables, scan-ready.

The reference delegates all schedule math to ``diffusers.DDIMScheduler``
configured via the ``diff:`` config block (``ckpts/ezaudio-xl.yml``):
scaled_linear betas [0.00085, 0.012], 1000 train steps, v-prediction,
``rescale_betas_zero_snr: true``, ``timestep_spacing: 'trailing'``,
``clip_sample: false``.  This module reimplements that exact math from the
published algorithms:

  * scaled-linear betas: ``linspace(sqrt(b0), sqrt(b1), N)^2``;
  * zero-terminal-SNR rescale (Lin et al., arXiv 2305.08891 §3): shift/scale
    ``sqrt(alpha_bar)`` so the last timestep has alpha_bar = 0 exactly;
  * trailing spacing: ``round(arange(N, 0, -N/S)) - 1`` (so the final
    training step N-1 is always included);
  * DDIM step (Song et al., arXiv 2010.02502 eq. 12) with the eta-variance
    ``sigma_t^2 = eta^2 * (1-a_prev)/(1-a_t) * (1 - a_t/a_prev)`` and
    v-prediction conversion ``x0 = sqrt(a) x - sqrt(1-a) v``,
    ``eps = sqrt(a) v + sqrt(1-a) x``;
  * ``final_alpha_cumprod = 1`` (diffusers ``set_alpha_to_one`` default) for
    the step whose previous timestep is < 0.

Everything is a pure function of precomputed float32 tables so the sampler
can run as a single ``lax.scan`` with per-step table gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int = 1000,
    beta_schedule: str = "scaled_linear",
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        def abar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        return np.minimum(1 - abar((ts + 1) / num_train_timesteps) / abar(ts / num_train_timesteps), 0.999)
    raise NotImplementedError(beta_schedule)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so terminal SNR is exactly zero (arXiv 2305.08891 alg. 1)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abar_sqrt = np.sqrt(alphas_cumprod)

    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)

    abar = abar_sqrt**2
    alphas = abar[1:] / abar[:-1]
    alphas = np.concatenate([abar[0:1], alphas])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Immutable schedule tables (numpy at build, jnp inside jit)."""

    num_train_timesteps: int
    alphas_cumprod: np.ndarray  # (N,) float32
    final_alpha_cumprod: float
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"
    clip_sample: bool = False

    @classmethod
    def from_config(cls, diff_cfg: dict) -> "DDIMSchedule":
        n = int(diff_cfg.get("num_train_timesteps", 1000))
        betas = make_betas(
            n,
            diff_cfg.get("beta_schedule", "scaled_linear"),
            float(diff_cfg.get("beta_start", 0.00085)),
            float(diff_cfg.get("beta_end", 0.012)),
        )
        if diff_cfg.get("rescale_betas_zero_snr", False):
            betas = rescale_zero_terminal_snr(betas)
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        # diffusers set_alpha_to_one defaults True (EzAudio doesn't override).
        return cls(
            num_train_timesteps=n,
            alphas_cumprod=alphas_cumprod,
            final_alpha_cumprod=1.0,
            prediction_type=diff_cfg.get("prediction_type", "v_prediction"),
            timestep_spacing=diff_cfg.get("timestep_spacing", "trailing"),
            clip_sample=bool(diff_cfg.get("clip_sample", False)),
        )

    # ------------------------------------------------------------------
    # Inference timestep grids
    # ------------------------------------------------------------------

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps (diffusers set_timesteps parity)."""
        n, s = self.num_train_timesteps, num_inference_steps
        if self.timestep_spacing == "trailing":
            step = n / s
            ts = np.round(np.arange(n, 0, -step)).astype(np.int64) - 1
        elif self.timestep_spacing == "leading":
            step = n // s
            ts = (np.arange(0, s) * step).round()[::-1].astype(np.int64)
        elif self.timestep_spacing == "linspace":
            ts = np.linspace(0, n - 1, s).round()[::-1].astype(np.int64)
        else:
            raise NotImplementedError(self.timestep_spacing)
        return ts

    def step_tables(self, num_inference_steps: int) -> Tuple[np.ndarray, ...]:
        """Per-inference-step (alpha_prod_t, alpha_prod_prev, timestep)."""
        ts = self.timesteps(num_inference_steps)
        prev = ts - self.num_train_timesteps // num_inference_steps
        a_t = self.alphas_cumprod[ts]
        a_prev = np.where(
            prev >= 0,
            self.alphas_cumprod[np.clip(prev, 0, None)],
            np.float32(self.final_alpha_cumprod),
        ).astype(np.float32)
        return a_t.astype(np.float32), a_prev, ts

    # ------------------------------------------------------------------
    # Pure-JAX step / training ops
    # ------------------------------------------------------------------

    def convert_output(self, model_output, sample, alpha_prod_t):
        """Return (pred_x0, pred_epsilon) for the configured prediction type."""
        a = alpha_prod_t
        sqrt_a = jnp.sqrt(a)
        sqrt_b = jnp.sqrt(1.0 - a)
        if self.prediction_type == "v_prediction":
            x0 = sqrt_a * sample - sqrt_b * model_output
            eps = sqrt_a * model_output + sqrt_b * sample
        elif self.prediction_type == "epsilon":
            eps = model_output
            x0 = (sample - sqrt_b * eps) / sqrt_a
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - sqrt_a * x0) / sqrt_b
        else:
            raise NotImplementedError(self.prediction_type)
        return x0, eps

    def ddim_step(
        self,
        model_output: jnp.ndarray,
        sample: jnp.ndarray,
        alpha_prod_t: jnp.ndarray,
        alpha_prod_prev: jnp.ndarray,
        eta: float = 0.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One DDIM update x_t -> x_{t-1} (diffusers DDIMScheduler.step parity)."""
        x0, eps = self.convert_output(model_output, sample, alpha_prod_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        variance = ((1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t)) * (
            1.0 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * jnp.sqrt(variance)
        direction = jnp.sqrt(jnp.maximum(1.0 - alpha_prod_prev - std**2, 0.0)) * eps
        prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
        if eta > 0:
            assert noise is not None, "eta > 0 requires noise"
            prev = prev + std * noise
        return prev

    def add_noise(self, sample, noise, timesteps):
        """q(x_t | x_0): ``sqrt(abar) x0 + sqrt(1-abar) eps``."""
        a = jnp.asarray(self.alphas_cumprod)[timesteps]
        a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, sample, noise, timesteps):
        """v target: ``sqrt(abar) eps - sqrt(1-abar) x0``."""
        a = jnp.asarray(self.alphas_cumprod)[timesteps]
        a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def snr(self, timesteps):
        """SNR(t) = abar / (1 - abar)  (reference src/utils/utils.py:61-86)."""
        a = jnp.asarray(self.alphas_cumprod)[timesteps]
        return a / (1.0 - a)
