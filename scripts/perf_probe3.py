"""Probe 3: in-scan step time with remat on/off and bf16 vs f32 params.

All timings via the 100-step scan (per-dispatch overhead amortized)."""

import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.sampling import sample_latents
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    sched = DDIMSchedule.from_config(cfg.diff)
    key = jax.random.PRNGKey(0)
    B = 4

    for ckpt in (True, False):
        mc = cfg.model.to_dict()
        mc["use_checkpoint"] = ckpt
        dit = maskdit_from_config(mc, dtype=jnp.bfloat16)
        x1 = jnp.zeros((1, 500, 128), jnp.bfloat16)
        ctx2 = jax.random.normal(key, (2 * B, 100, mc["context_dim"]), jnp.bfloat16)
        params = dit.init({"params": key, "mask": key}, x1,
                          jnp.zeros((1,), jnp.int32), ctx2[:1])

        for pdt in ("f32", "bf16"):
            p = params if pdt == "f32" else jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), params)

            def run(pp, n, k):
                def model_fn(lat, tt):
                    out, _ = dit.apply(pp, lat, tt, ctx2)
                    return out
                return sample_latents(model_fn, sched, n, k, 100,
                                      guidance_scale=5.0,
                                      guidance_rescale=0.75, eta=1.0)

            run = jax.jit(run)
            noise = jax.random.normal(key, (B, 500, 128), jnp.bfloat16)
            dt = timeit(run, p, noise, key)
            print(f"remat={ckpt} params={pdt}: 100-step scan {dt:.2f} s")
        del params


if __name__ == "__main__":
    main()
