"""probe13: where does the Oobleck VAE decode spend its time?

Context: at the r3 fast recipe (~0.78 s / batch-4 clip) the decode's
~109 ms device time (probe4) is ~14% of end-to-end — past the 5%
materiality bar that retired the fused-decoder idea in round 2.  The
decoder is ~500 GFLOP/clip; 109 ms/batch-4 = ~18 TFLOP/s = ~9% of v5e
bf16 peak, so there is headroom IF the convs are lowered badly.

Suspect: ``ConvTranspose1d`` lowers via ``lhs_dilation`` — at stride 10
the MXU multiplies 90% zeros unless XLA polyphase-decomposes (it does
not on TPU).  Measures, same session:
  1. full decode (current path), in-scan device time;
  2. per-stage cost: stem / each DecoderBlock / head, separately jitted
     on the stage's true input shape;
  3. a polyphase dense-matmul ConvTranspose rewrite A/B (one
     (B*(T+1), 2C) @ (2C, s*C_out) dot per upsample — exact for the
     k=2s, even-s Oobleck geometry), numerics checked vs the lax path.

Run ON the TPU; all timings in-scan (np.asarray-forced), median of 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ezaudio_tpu.codecs.oobleck import OobleckDecoder

B = int(os.environ.get("PROBE_BATCH", "4"))
T = 500
DTYPE = jnp.bfloat16
CH, MULTS, STRIDES = 128, (1, 2, 4, 8), (2, 4, 6, 10)
REPS = 10


def timeit(fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_time(apply_fn, params, x, reps=REPS):
    """Device time per call: scan the op `reps` times, subtract nothing —
    the tunnel dispatch amortizes over the scan."""

    @jax.jit
    def run(p, x0):
        def body(c, _):
            y = apply_fn(p, c)
            # keep shapes fixed: feed back a reduced view of y into a
            # same-shaped carry so XLA can't DCE the op
            c2 = c + jnp.mean(y).astype(c.dtype)
            return c2, jnp.mean(y)
        _, ys = lax.scan(body, x0, None, length=reps)
        return ys
    return timeit(run, params, x) / reps


def main():
    key = jax.random.PRNGKey(0)
    dec = OobleckDecoder(out_channels=1, channels=CH, latent_dim=CH,
                         c_mults=MULTS, strides=STRIDES, dtype=DTYPE)
    z = jax.random.normal(key, (B, T, CH), DTYPE)
    params = dec.init(key, z)["params"]

    t_full = scan_time(lambda p, x: dec.apply({"params": p}, x), params, z)
    flops = 499e9 * B  # decoder GFLOPs per 10 s clip (BASELINE.md estimate)
    print(f"[decode full] {t_full*1e3:.1f} ms/batch{B}"
          f"  ~{flops/t_full/1e12:.1f} TFLOP/s")

    # per-stage: rebuild the stage stack shapes
    from ezaudio_tpu.codecs.oobleck import DecoderBlock
    from ezaudio_tpu.ops.convs import Conv1d

    mults = (1,) + MULTS
    stages = []
    stages.append(("stem", Conv1d(CH, mults[-1] * CH, 7, padding=3,
                                  dtype=DTYPE), (B, T, CH)))
    t_cur = T
    n = len(STRIDES)
    for j, i in enumerate(range(n, 0, -1)):
        s = STRIDES[i - 1]
        stages.append((f"block{j} (s={s}, {mults[i]*CH}->{mults[i-1]*CH})",
                       DecoderBlock(mults[i] * CH, mults[i - 1] * CH, s,
                                    dtype=DTYPE), (B, t_cur, mults[i] * CH)))
        t_cur *= s
    stages.append(("head", Conv1d(CH, 1, 7, padding=3, use_bias=False,
                                  dtype=DTYPE), (B, t_cur, CH)))

    total = 0.0
    for name, mod, shape in stages:
        x = jax.random.normal(key, shape, DTYPE)
        p = mod.init(key, x)["params"]
        t = scan_time(lambda p, x, m=mod: m.apply({"params": p}, x), p, x)
        total += t
        print(f"  [{name}] in={shape}  {t*1e3:6.1f} ms")
    print(f"  [sum of stages] {total*1e3:.1f} ms (vs full {t_full*1e3:.1f})")

    # --- polyphase vs lax ConvTranspose A/B (trace-time env switch) ---
    for impl in ("lax", "polyphase"):
        os.environ["EZAUDIO_CONVT_IMPL"] = impl
        t = scan_time(lambda p, x: dec.apply({"params": p}, x), params, z)
        print(f"[decode full, convT={impl}] {t*1e3:.1f} ms/batch{B}"
              f"  ~{flops/t/1e12:.1f} TFLOP/s")
    # numerics check on-chip
    os.environ["EZAUDIO_CONVT_IMPL"] = "lax"
    y_lax = np.asarray(jax.jit(
        lambda p, x: dec.apply({"params": p}, x))(params, z), np.float32)
    os.environ["EZAUDIO_CONVT_IMPL"] = "polyphase"
    y_pp = np.asarray(jax.jit(
        lambda p, x: dec.apply({"params": p}, x))(params, z), np.float32)
    rel = np.abs(y_pp - y_lax).max() / (np.abs(y_lax).max() + 1e-9)
    print(f"[convT numerics] max rel err polyphase vs lax: {rel:.2e}")


if __name__ == "__main__":
    main()
