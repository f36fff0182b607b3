"""Attention-implementation A/B at XL geometry, one session (VERDICT #7).

Compares, at s3_xl shapes (dim 1152, 16 heads, L=500 + 100-token cross):
  * einsum   — current default (f32 logits materialized);
  * flash    — jax's production TPU Pallas flash kernel (no logits in HBM);
  * pallas   — the round-1 single-block kernel (known ~27% loss);
over a 20-step jitted scan (amortizes the ~70 ms tunnel dispatch), at
batch 4 and 16, with np.asarray materialization (block_until_ready
under-reports through the axon tunnel).

Run:  python -u scripts/perf_probe5.py [impls...]
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
    impls = sys.argv[1:] or ["einsum", "flash"]
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    import ezaudio_tpu.models.blocks as blocks_mod

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)

    params = None
    for impl in impls:
        # The runtime switch is the EZAUDIO_ATTN_IMPL env var, read at TRACE
        # time inside Attention when the configured impl is "auto" (setting
        # the class attribute is a no-op: flax dataclass defaults are baked
        # into __init__, and UDiT passes attention_impl explicitly anyway).
        os.environ["EZAUDIO_ATTN_IMPL"] = impl
        dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
        if params is None:
            params = dit.init({"params": key, "mask": key},
                              jnp.zeros((1, L, C), jnp.bfloat16),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, Lc, D), jnp.bfloat16))

        for B in (4, 16):
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
            dt = timeit(runj, params, x, ctx)
            per_step = dt / STEPS * 1000
            print(f"[{impl}] B={B} (pair {2*B}): {per_step:.1f} ms/step "
                  f"({per_step/(2*B):.2f} ms/sample)", flush=True)

    blocks_mod.Attention.attention_impl = "auto"


if __name__ == "__main__":
    main()
