"""Layer-cache sampling A/B at XL geometry, one session.

Times the plain DDIM scan vs the layer-cached scan
(diffusion/sampling.py::sample_latents_layer_cached) at s3_xl shapes
(depth 28 -> half=14).  Cached steps recompute only k in-blocks + k
out-blocks + embeddings/final around the cached deep activation, so the
ideal blended cost at interval m is (1 + (m-1) * ~(2k/depth)) / m of the
full-step cost.

Run:  python -u scripts/perf_probe8.py [k] [intervals...]
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

STEPS = 20
B = 4


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
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    intervals = [int(v) for v in sys.argv[2:]] or [2, 4]

    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.sampling import (
        sample_latents, sample_latents_layer_cached)
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)

    dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, Lc, D), jnp.bfloat16))
    schedule = DDIMSchedule.from_config(cfg.diff.to_dict())

    ctx = jax.random.normal(key, (2 * B, Lc, D), jnp.bfloat16)
    noise = jax.random.normal(key, (B, L, C), jnp.bfloat16)

    # params ride as jit ARGUMENTS (closing over them would capture 3.5 GB
    # of constants into the HLO)
    def plain_p(p, lat, t):
        out, _ = dit.apply(p, lat, t, ctx[: lat.shape[0]])
        return out

    def full_p(p, lat, t):
        (out, deep), _ = dit.apply(p, lat, t, ctx[: lat.shape[0]],
                                   collect_deep_k=k)
        return out, deep

    def cached_p(p, lat, t, deep):
        out, _ = dit.apply(p, lat, t, ctx[: lat.shape[0]],
                           deep_cache=(k, deep))
        return out

    base = jax.jit(lambda p, n0: sample_latents(
        lambda lat, t: plain_p(p, lat, t), schedule, n0, key, STEPS,
        guidance_scale=5.0, eta=1.0))
    dt = timeit(base, params, noise)
    print(f"[plain]    {dt/STEPS*1000:.1f} ms/step", flush=True)

    for m in intervals:
        lc = jax.jit(lambda p, n0, m=m: sample_latents_layer_cached(
            lambda lat, t: full_p(p, lat, t),
            lambda lat, t, deep: cached_p(p, lat, t, deep),
            schedule, n0, key, STEPS, cache_interval=m,
            guidance_scale=5.0, eta=1.0))
        dt_m = timeit(lc, params, noise)
        print(f"[cache k={k} m={m}] {dt_m/STEPS*1000:.1f} ms/step "
              f"({dt/dt_m:.2f}x vs plain)", flush=True)


if __name__ == "__main__":
    main()
