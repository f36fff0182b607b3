"""Batch-scaling attention A/B, one session (VERDICT r2 item 5).

The einsum path materializes (2B, 16, 500, 500) f32 attention scores per
layer — the diagnosed driver of the ms/step/sample rise from batch 4 to 16
(BASELINE.md probe4/probe6).  This probe A/Bs the no-new-kernel variants:

  * einsum       — default (f32 logits materialized);
  * bf16         — bf16 logits/softmax (half the score HBM traffic);
  * chunked      — lax.scan over 128-query tiles (score tile live, not the
                   full matrix);
  * chunked_bf16 — both.

20-step jitted scan at s3_xl geometry, batch 4 and 16, np.asarray
materialization.  Correctness: each variant is compared against einsum on
one forward before timing (max rel err printed).

Run:  python -u scripts/perf_probe11.py [impls...]
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
    impls = sys.argv[1:] or ["einsum", "bf16", "chunked", "chunked_bf16"]
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)

    params = None
    ref_out = None
    for impl in impls:
        # trace-time switch (flax dataclass fields bake into __init__;
        # the env var is the runtime switch — see probe5's corrected note)
        os.environ["EZAUDIO_ATTN_IMPL"] = impl
        dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
        if params is None:
            params = dit.init({"params": key, "mask": key},
                              jnp.zeros((1, L, C), jnp.bfloat16),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, Lc, D), jnp.bfloat16))

        # correctness vs einsum on one forward (batch 2)
        x1 = jax.random.normal(key, (2, L, C), jnp.bfloat16)
        c1 = jax.random.normal(key, (2, Lc, D), jnp.bfloat16)
        o = np.asarray(jax.jit(lambda p, x, c: dit.apply(
            p, x, jnp.full((2,), 500, jnp.int32), c)[0])(params, x1, c1),
            np.float32)
        if impl == "einsum":
            ref_out = o
        elif ref_out is not None:
            rel = np.abs(o - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
            print(f"[{impl}] max rel err vs einsum: {rel:.4f}", flush=True)

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

    os.environ.pop("EZAUDIO_ATTN_IMPL", None)


if __name__ == "__main__":
    main()
