"""Rectified flow / flow matching: schedule, sampler and training target.

The reference is DDIM-only; the retrieved acceleration literature
(PAPERS.md: FlashAudio arXiv 2410.12266, MeanAudio arXiv 2508.06098) moves
text-to-audio to rectified flows for few-step generation.  This module adds
that capability in the same scan-compiled style as ``ddim.py``:

  * linear interpolation path x_t = (1-t) x0 + t eps  (t in [0,1],
    t=1 pure noise — matching the diffusion convention that sampling
    starts from noise);
  * training target: the constant velocity  v = eps - x0  (flow matching,
    Lipman et al. arXiv 2210.02747 / rectified flow Liu et al. 2209.03003);
  * samplers: Euler and Heun (2nd order) over a configurable timestep grid,
    with CFG handled exactly like the DDIM sampler.

The model contract matches MaskDiT: ``model_fn(x_t, t_scaled)`` where
``t_scaled = t * num_train_timesteps`` so the same timestep embedding range
is reused.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowSchedule:
    num_train_timesteps: int = 1000
    shift: float = 1.0  # timestep shift (SD3-style lognorm shift), 1 = uniform

    # ------------------------------------------------------------------
    def timesteps(self, num_steps: int) -> np.ndarray:
        """Descending grid t_i in (0, 1]: t_0 = 1 (noise) -> t_N = 0."""
        t = np.linspace(1.0, 0.0, num_steps + 1)
        if self.shift != 1.0:
            s = self.shift
            t = s * t / (1 + (s - 1) * t)
        return t.astype(np.float32)

    # ------------------------------------------------------------------
    def interpolate(self, x0, noise, t):
        """x_t = (1-t) x0 + t noise, t broadcast from (B,)."""
        t = t.reshape(t.shape + (1,) * (x0.ndim - t.ndim))
        return (1.0 - t) * x0 + t * noise

    def velocity_target(self, x0, noise):
        """Flow-matching regression target (constant along the path)."""
        return noise - x0

    def loss_weight(self, t):
        """Uniform by default; hook for lognorm weighting variants."""
        return jnp.ones_like(t)


def flow_sample(
    model_fn: Callable,
    schedule: FlowSchedule,
    noise: jnp.ndarray,
    num_steps: int,
    guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
    method: str = "euler",
) -> jnp.ndarray:
    """Integrate dx/dt = v(x, t) from t=1 (noise) to t=0 in one scan.

    ``model_fn(x, t_scaled)`` predicts velocity; with guidance it receives
    the doubled batch like the DDIM sampler.
    """
    from ezaudio_tpu.diffusion.sampling import rescale_noise_cfg

    ts = jnp.asarray(schedule.timesteps(num_steps))
    scale_t = float(schedule.num_train_timesteps)

    def predict(x, t):
        t_model = t * scale_t
        if guidance_scale is not None:
            pair = jnp.concatenate([x, x], axis=0)
            out = model_fn(pair, t_model)
            cond, uncond = jnp.split(out, 2, axis=0)
            v = uncond + guidance_scale * (cond - uncond)
            if guidance_rescale > 0.0:
                v = rescale_noise_cfg(v, cond, guidance_rescale)
            return v
        return model_fn(x, t_model)

    def body(x, i):
        t, t_next = ts[i], ts[i + 1]
        dt = t_next - t  # negative
        v = predict(x, t)
        if method == "euler":
            x_next = x + dt * v
        elif method == "heun":
            x_mid = x + dt * v
            v2 = predict(x_mid, t_next)
            x_next = x + dt * 0.5 * (v + v2)
        else:
            raise NotImplementedError(method)
        return x_next.astype(x.dtype), None

    x, _ = jax.lax.scan(body, noise, jnp.arange(num_steps))
    return x


def flow_matching_loss(model_apply, params, x0, noise, t, rngs=None,
                       mask=None, schedule: Optional[FlowSchedule] = None,
                       **model_kwargs):
    """Masked flow-matching MSE (same masking semantics as the diffusion
    loss): model predicts v at x_t; target eps - x0.

    ``schedule`` must be the SAME FlowSchedule used by :func:`flow_sample`
    (its ``num_train_timesteps`` sets the model's timestep-embedding scale
    and its ``loss_weight`` hook weights the per-sample loss); defaults to
    ``FlowSchedule()``."""
    sched = schedule or FlowSchedule()
    xt = sched.interpolate(x0, noise, t)
    target = sched.velocity_target(x0, noise)
    pred, mae_mask = model_apply(params, xt, t * sched.num_train_timesteps,
                                 rngs=rngs, **model_kwargs)
    m = mae_mask if mask is None else mask
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    err = err * m.astype(jnp.float32)
    per = err.sum(axis=tuple(range(1, err.ndim))) / jnp.maximum(
        m.sum(axis=tuple(range(1, m.ndim))), 1.0)
    return (sched.loss_weight(t) * per).mean()
