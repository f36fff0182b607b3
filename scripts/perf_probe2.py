"""Probe 2: does padding the 500-token sequence to 512 speed up the DiT?

Also times a fused-QKV matmul against three separate projections at the
XL shape, to size up that refactor before doing it.
"""

import os
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
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
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    cfg = get_model_config("s3_xl")
    key = jax.random.PRNGKey(0)
    B = 8

    for L in (500, 512):
        mc = cfg.model.to_dict()
        mc["img_size"] = L
        dit = maskdit_from_config(mc, dtype=jnp.bfloat16)
        x = jax.random.normal(key, (B, L, mc["out_chans"]), jnp.bfloat16)
        t = jnp.full((B,), 500, jnp.int32)
        ctx = jax.random.normal(key, (B, 100, mc["context_dim"]), jnp.bfloat16)
        params = dit.init({"params": key, "mask": key}, x[:1], t[:1], ctx[:1])
        fwd = jax.jit(lambda p, x, t, c: dit.apply(p, x, t, c)[0])
        dt = timeit(fwd, params, x, t, ctx, n=5)
        print(f"L={L}: DiT fwd batch {B}: {dt*1000:.1f} ms")
        del params

    # fused vs split qkv at XL shape
    D = 1152
    tokens = jax.random.normal(key, (B * 512, D), jnp.bfloat16)
    w3 = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
    w1 = [jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02 for _ in range(3)]

    fused = jax.jit(lambda x, w: x @ w)
    split = jax.jit(lambda x, a, b, c: (x @ a, x @ b, x @ c))
    print(f"fused qkv: {timeit(fused, tokens, w3)*1e3:.2f} ms")
    print(f"split qkv: {timeit(split, tokens, *w1)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
