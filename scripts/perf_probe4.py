"""Batch-scaling decomposition probe (VERDICT r1 weak #2).

Why does s3_xl throughput regress at batch 8/16?  In ONE session, for each
batch size this measures:
  * one CFG-pair DiT forward (batch 2B) — raw FLOP scaling;
  * the full 100-step DDIM scan — scan-resident memory effects;
  * XLA's own memory analysis of the compiled scan (temp bytes = HBM
    high-water mark) — if this nears the 16 GB v5e HBM, XLA serializes;
  * VAE decode;
  * pure device->host transfer of the finished waveform (tunnel bandwidth).

Run on the TPU:  python scripts/perf_probe4.py [batches...]
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


def timeit(fn, *args, n=3, warmup=1, materialize=True):
    for _ in range(warmup):
        r = fn(*args)
        np.asarray(r) if materialize else jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r) if materialize else jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def gb(x):
    return x / (1 << 30)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.diffusion.sampling import sample_latents
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)
    dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
    sched = DDIMSchedule.from_config(cfg.diff)

    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, Lc, D), jnp.bfloat16))
    psize = sum(np.prod(x.shape) * x.dtype.itemsize
                for x in jax.tree.leaves(params))
    print(f"params: {gb(psize):.2f} GiB ({psize/1e9*0.5:.0f}M bf16)")

    for B in batches:
        ctx2 = jax.random.normal(key, (2 * B, Lc, D), jnp.bfloat16)
        x2 = jax.random.normal(key, (2 * B, L, C), jnp.bfloat16)
        t = jnp.full((2 * B,), 500, jnp.int32)

        fwd = jax.jit(lambda p, x, tt, c: dit.apply(p, x, tt, c)[0])
        dt_f = timeit(fwd, params, x2, t, ctx2, materialize=False)
        print(f"[B={B}] DiT fwd batch {2*B}: {dt_f*1000:.1f} ms "
              f"({dt_f*1000/(2*B):.2f} ms/sample)")

        def run(p, n, c, k):
            def model_fn(lat, tt):
                out, _ = dit.apply(p, lat, tt, c)
                return out
            return sample_latents(model_fn, sched, n, k, 100,
                                  guidance_scale=5.0,
                                  guidance_rescale=0.75, eta=1.0)

        runj = jax.jit(run)
        noise = jax.random.normal(key, (B, L, C), jnp.bfloat16)

        lowered = runj.lower(params, noise, ctx2, key)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            print(f"[B={B}] scan memory: temp={gb(ma.temp_size_in_bytes):.2f} "
                  f"args={gb(ma.argument_size_in_bytes):.2f} "
                  f"out={gb(ma.output_size_in_bytes):.2f} GiB")

        # device-only (no host transfer)
        dt_dev = timeit(runj, params, noise, ctx2, key, materialize=False)
        # with host materialization (what bench.py pays)
        dt_host = timeit(runj, params, noise, ctx2, key, materialize=True)
        per = dt_dev / B
        print(f"[B={B}] 100-step scan: device {dt_dev:.2f} s "
              f"({per:.3f} s/clip) | +host xfer {dt_host:.2f} s | "
              f"ideal-from-fwd {100*dt_f:.2f} s")

    # VAE decode + transfer scaling
    import json

    from ezaudio_tpu.codecs.oobleck import vae_from_config
    from ezaudio_tpu.config import MODEL_REGISTRY

    with open(MODEL_REGISTRY["vae"]["config"]) as f:
        vae_cfg = json.load(f)
    vae = vae_from_config(vae_cfg, dtype=jnp.bfloat16)
    vp = vae.init({"params": key, "sample": key},
                  jnp.zeros((1, 480 * 4, 1), jnp.bfloat16))
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=lambda m, z: m.decoder(z)))
    for B in batches:
        zb = jax.random.normal(key, (B, L, C), jnp.bfloat16)
        dt_dev = timeit(dec, vp, zb, materialize=False)
        dt_host = timeit(dec, vp, zb, materialize=True)
        print(f"[B={B}] VAE decode: device {dt_dev*1000:.0f} ms | "
              f"+host {dt_host*1000:.0f} ms")

    # raw tunnel bandwidth: device->host of a (B, 240000) f32 waveform
    for B in batches:
        w = jnp.zeros((B, 240000), jnp.float32) + 1.0
        w = jax.block_until_ready(w)
        t0 = time.perf_counter()
        np.asarray(w)
        dt = time.perf_counter() - t0
        mb = B * 240000 * 4 / 1e6
        print(f"[B={B}] D->H {mb:.1f} MB: {dt*1000:.0f} ms "
              f"({mb/dt:.0f} MB/s)")


if __name__ == "__main__":
    main()
