"""int8 (W8A8) vs bf16 DiT sampling A/B at XL geometry, one session.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; BASELINE.md
probe6 showed the bf16 sampler is compute-bound at ~50% MFU, so dynamic
quantization of the DiT linears (ops/quant.py) is the remaining lever.
Same harness as probe5: 20-step jitted scan, np.asarray materialization,
both variants timed back-to-back in ONE session (tunnel varies +-25%
across sessions).

Run:  python -u scripts/perf_probe7.py [batches...]
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
    batches = [int(b) for b in sys.argv[1:]] or [4, 16]
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.ops.quant import quant_context

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)

    dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, Lc, D), jnp.bfloat16))

    for mode in (None, "int8"):
        for B in batches:
            x = jax.random.normal(key, (2 * B, L, C), jnp.bfloat16)
            ctx = jax.random.normal(key, (2 * B, Lc, D), jnp.bfloat16)

            def run(p, x0, c):
                def body(h, i):
                    t = jnp.full((x0.shape[0],), 500 - i, jnp.int32)
                    out, _ = dit.apply(p, h, t, c)
                    return out.astype(h.dtype), None

                h, _ = jax.lax.scan(body, x0, jnp.arange(STEPS))
                return h

            runj = jax.jit(run)
            with quant_context(mode):
                dt = timeit(runj, params, x, ctx)
            per_step = dt / STEPS * 1000
            name = mode or "bf16"
            print(f"[{name}] B={B} (pair {2*B}): {per_step:.1f} ms/step "
                  f"({per_step/(2*B):.2f} ms/sample)", flush=True)


if __name__ == "__main__":
    main()
