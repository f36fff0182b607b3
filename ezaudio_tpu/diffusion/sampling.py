"""The jitted DDIM sampling loop: one `lax.scan` over timesteps.

Behavioral parity with reference ``src/inference.py:26-107`` (and the
ControlNet variant ``src/inference_controlnet.py``):
  * CFG by a doubled batch [cond; uncond] -> single backbone call;
  * guidance ``uncond + s * (cond - uncond)``;
  * optional CFG rescale (arXiv 2305.08891 §3.4) — std computed with the
    same Bessel correction torch.std uses;
  * eta-noised DDIM step;
  * inpainting: masked positions generated, unmasked positions pasted back
    from the ground-truth latent at the end (inference.py:104-105 as a
    ``jnp.where``).

TPU design: the model function is closed over parameters, the per-step
tables are gathered by scan index, the per-step eta-noise comes from
``jax.random.fold_in`` of one key, and the whole loop compiles to a single
XLA while-loop (or up to three, with a guidance interval).  The CFG pair
rides the batch axis, which is the axis the data-parallel mesh shards
(see ezaudio_tpu.parallel).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.diffusion.ddim import DDIMSchedule


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """Std-matching CFG rescale (reference src/inference.py:12-23).

    Uses ddof=1 (Bessel) to match ``torch.std``'s default.
    """
    dims = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=dims, keepdims=True, ddof=1)
    std_cfg = jnp.std(noise_cfg, axis=dims, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def guidance_band(ts_np, num_steps: int, cfg_on: bool,
                  guidance_interval) -> np.ndarray:
    """Static per-step CFG flags for a ``(t_lo, t_hi)`` guidance band
    (arXiv 2404.07724).  Validates the ordering — a reversed tuple would
    otherwise silently disable CFG everywhere.  With no band (or CFG off)
    the flags are constant, so segmentation degenerates to one scan."""
    if cfg_on and guidance_interval is not None:
        t_lo, t_hi = guidance_interval
        if t_lo > t_hi:
            raise ValueError(
                "guidance_interval must be (t_lo, t_hi) with t_lo <= t_hi, "
                f"got {guidance_interval!r}")
        return (np.asarray(ts_np) >= t_lo) & (np.asarray(ts_np) <= t_hi)
    return np.full(num_steps, cfg_on, dtype=bool)


def equal_flag_runs(flags):
    """Yield ``(start, end, flag)`` for maximal runs of equal values —
    the static segmentation both samplers scan over (each run is one
    `lax.scan` over the SAME carry, so multistep history crosses runs)."""
    n = len(flags)
    start = 0
    while start < n:
        end = start
        while end < n and flags[end] == flags[start]:
            end += 1
        yield start, end, bool(flags[start])
        start = end


def group_band(in_band: np.ndarray, cache_interval: int,
               groups: int) -> np.ndarray:
    """Group-level CFG flags under layer caching: any in-band step turns
    its whole cache group on (outward rounding — full + cached calls in a
    group share a batch size, since the deep cache is collected at the
    group head)."""
    return np.array(
        [in_band[g * cache_interval:(g + 1) * cache_interval].any()
         for g in range(groups)], dtype=bool)


def sample_latents(
    model_fn: Callable,
    schedule: DDIMSchedule,
    noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
    eta: float = 1.0,
    guidance_interval: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Run the DDIM loop.

    ``model_fn(latents, t) -> model_output`` must handle CFG internally if
    ``guidance_scale`` is None; otherwise it receives the *single* batch and
    this function forms the CFG pair:
        ``model_fn(latents_2B, t) -> output_2B``  (cond first, uncond second)
    — callers build that closure over text embeddings (see api/ezaudio.py).

    Inpainting gt latents ride inside the caller's closure; the final
    gt paste happens in the API layer *after* scale_shift_re, matching the
    reference order (inference.py:102-105).

    ``guidance_interval``: optional (t_lo, t_hi) — apply CFG only while the
    *training* timestep lies in [t_lo, t_hi] (Kynkaanniemi et al.,
    arXiv 2404.07724: guidance matters mainly at mid noise levels).  Steps
    outside the band run the conditional model alone at HALF the compute.
    The split is static (ts is a precomputed table), so the loop compiles
    as contiguous scans each with a fixed batch shape.

    Returns final latents (B, L, C).
    """
    a_t_np, a_prev_np, ts_np = schedule.step_tables(num_steps)
    a_t = jnp.asarray(a_t_np)
    a_prev = jnp.asarray(a_prev_np)
    ts = jnp.asarray(ts_np)

    def body_for(use_cfg: bool):
        def body(latents, i):
            t = ts[i]
            if use_cfg:
                pair = jnp.concatenate([latents, latents], axis=0)
                out = model_fn(pair, t)
                cond, uncond = jnp.split(out, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
                if guidance_rescale > 0.0:
                    pred = rescale_noise_cfg(pred, cond, guidance_rescale)
            else:
                pred = model_fn(latents, t)

            step_noise = None
            if eta > 0:
                step_noise = jax.random.normal(
                    jax.random.fold_in(key, i), latents.shape, latents.dtype
                )
            new_latents = schedule.ddim_step(
                pred, latents, a_t[i], a_prev[i], eta=eta, noise=step_noise
            )
            # keep the scan carry dtype stable under bf16 compute (the f32
            # schedule tables promote the update to f32)
            return new_latents.astype(latents.dtype), None

        return body

    in_band = guidance_band(ts_np, num_steps, guidance_scale is not None,
                            guidance_interval)
    latents = noise
    for start, end, flag in equal_flag_runs(in_band):
        latents, _ = jax.lax.scan(
            body_for(flag), latents, jnp.arange(start, end))
    return latents


def sample_latents_layer_cached(
    model_full: Callable,
    model_cached: Callable,
    schedule: DDIMSchedule,
    noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    cache_interval: int = 2,
    guidance_scale: Optional[float] = None,
    guidance_rescale: float = 0.0,
    eta: float = 1.0,
    guidance_interval: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """DDIM loop with cross-step DiT layer caching (training-free
    acceleration: deep U-stack features drift slowly between adjacent
    timesteps, so only every ``cache_interval``-th step runs the full
    depth; the others recompute shallow layers around a cached deep
    activation — see udit.py ``collect_deep_k``/``deep_cache``).

    ``model_full(latents, t) -> (model_output, deep)`` refreshes the cache;
    ``model_cached(latents, t, deep) -> model_output`` consumes it.  Both
    receive the CFG pair batch when ``guidance_scale`` is set, exactly like
    :func:`sample_latents`.

    ``guidance_interval`` composes like in :func:`sample_latents` but the
    CFG band rounds OUTWARD to cache-group boundaries (full + cached calls
    within one group must share a batch size, since the deep cache is
    collected at the group head) — at most ``cache_interval - 1`` extra
    CFG steps per band edge.

    TPU design: the scan runs over step *groups*; each group body unrolls
    one full step plus ``cache_interval - 1`` cached steps, so the deep
    cache is a scan-local value (never a carry) and the whole loop is one
    XLA while-loop with a static body.  ``cache_interval=1`` degenerates to
    the plain sampler (bit-identical — tested).
    """
    assert cache_interval >= 1
    a_t_np, a_prev_np, ts_np = schedule.step_tables(num_steps)
    a_t = jnp.asarray(a_t_np)
    a_prev = jnp.asarray(a_prev_np)
    ts = jnp.asarray(ts_np)
    cfg_on = guidance_scale is not None
    in_band = guidance_band(ts_np, num_steps, cfg_on, guidance_interval)

    def predict(latents, t, deep, use_cfg=cfg_on):
        """One model call (+CFG); deep=None -> full call, returns new deep."""
        batch = jnp.concatenate([latents, latents], axis=0) if use_cfg else latents
        if deep is None:
            out, new_deep = model_full(batch, t)
        else:
            out, new_deep = model_cached(batch, t, deep), deep
        if use_cfg:
            cond, uncond = jnp.split(out, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
            if guidance_rescale > 0.0:
                pred = rescale_noise_cfg(pred, cond, guidance_rescale)
        else:
            pred = out
        return pred, new_deep

    def ddim_update(latents, pred, i):
        step_noise = None
        if eta > 0:
            step_noise = jax.random.normal(
                jax.random.fold_in(key, i), latents.shape, latents.dtype)
        new = schedule.ddim_step(pred, latents, a_t[i], a_prev[i], eta=eta,
                                 noise=step_noise)
        return new.astype(latents.dtype)

    groups = num_steps // cache_interval
    # group-level CFG flag: outward rounding to cache-group boundaries
    g_band = group_band(in_band, cache_interval, groups)

    def group_body_for(use_cfg: bool):
        def group_body(latents, g):
            i0 = g * cache_interval
            pred, deep = predict(latents, ts[i0], None, use_cfg)
            latents = ddim_update(latents, pred, i0)
            for j in range(1, cache_interval):
                pred, _ = predict(latents, ts[i0 + j], deep, use_cfg)
                latents = ddim_update(latents, pred, i0 + j)
            return latents, None
        return group_body

    latents = noise
    for g0, g1, flag in equal_flag_runs(g_band):
        latents, _ = jax.lax.scan(
            group_body_for(flag), latents, jnp.arange(g0, g1))
    # remainder steps (num_steps not divisible by the interval): full calls
    for i in range(groups * cache_interval, num_steps):
        pred, _ = predict(latents, ts[i], None, bool(in_band[i]))
        latents = ddim_update(latents, pred, i)
    return latents
