"""Performance decomposition probe for the s3_xl sampling path.

Times each pipeline piece in isolation on the real accelerator:
  * one CFG-pair DiT forward (batch 2B),
  * the full 100-step scan,
  * the VAE decode,
  * T5 encode,
and a couple of ablations (einsum vs pallas attention, eta noise on/off).

Run:  python scripts/perf_probe.py [batch]
"""

import sys
import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    # materialize to host: through the axon tunnel, block_until_ready alone
    # under-reports (device queue acks early); np.asarray forces the real
    # round trip like the end-to-end bench does
    for _ in range(warmup):
        np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.sampling import sample_latents
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = cfg.model.img_size, cfg.model.out_chans, cfg.model.context_dim, 100
    key = jax.random.PRNGKey(0)

    for impl in ("pallas", "einsum"):
        model_cfg = cfg.model.to_dict()
        dit = maskdit_from_config(model_cfg, dtype=jnp.bfloat16)
        # monkey-set attention impl through the module tree default
        import ezaudio_tpu.models.blocks as blocks_mod

        orig = blocks_mod.Attention.attention_impl
        blocks_mod.Attention.attention_impl = impl

        x2 = jax.random.normal(key, (2 * B, L, C), jnp.bfloat16)
        ctx2 = jax.random.normal(key, (2 * B, Lc, D), jnp.bfloat16)
        t = jnp.full((2 * B,), 500, jnp.int32)
        params = dit.init({"params": key, "mask": key}, x2[:1], t[:1], ctx2[:1])

        fwd = jax.jit(lambda p, x, t, c: dit.apply(p, x, t, c)[0])
        dt = timeit(fwd, params, x2, t, ctx2)
        print(f"[{impl}] DiT fwd (batch {2*B}): {dt*1000:.1f} ms "
              f"-> {100*dt:.2f} s per 100 steps")

        sched = DDIMSchedule.from_config(cfg.diff)
        noise = jax.random.normal(key, (B, L, C), jnp.bfloat16)

        for eta in (1.0, 0.0):
            def run(p, n, k, eta=eta):
                def model_fn(lat, tt):
                    out, _ = dit.apply(p, lat, tt, ctx2)
                    return out
                return sample_latents(model_fn, sched, n, k, 100,
                                      guidance_scale=5.0,
                                      guidance_rescale=0.75, eta=eta)
            run = jax.jit(run)
            dt = timeit(run, params, noise, key, n=3, warmup=1)
            print(f"[{impl}] full 100-step scan eta={eta}: {dt:.2f} s")

        blocks_mod.Attention.attention_impl = orig
        del params

    # VAE decode
    import json, os

    from ezaudio_tpu.codecs.oobleck import vae_from_config
    from ezaudio_tpu.config import MODEL_REGISTRY

    with open(os.path.join(os.path.dirname(MODEL_REGISTRY["vae"]["config"]), "vae.json")) as f:
        vae_cfg = json.load(f)
    vae = vae_from_config(vae_cfg, dtype=jnp.bfloat16)
    zb = jax.random.normal(key, (B, L, C), jnp.bfloat16)
    vp = vae.init({"params": key, "sample": key}, jnp.zeros((1, 480 * 4, 1), jnp.bfloat16))
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=lambda m, z: m.decoder(z)))
    dt = timeit(dec, vp, zb, n=3)
    print(f"VAE decode (batch {B}, 10s): {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
