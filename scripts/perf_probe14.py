"""probe14: fused-kernel VAE decode A/B on the real chip (follows probe13).

Measures the full Oobleck decode at the bench geometry (batch 4, 500
latent frames, bf16) three ways in one session:
  * flax module path (XLA, the previous default);
  * fused path (ops/pallas/resunit.py kernel for every ResidualUnit);
  * numerics check fused vs flax.
"""

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

from ezaudio_tpu.codecs.oobleck import AudioVAE
from ezaudio_tpu.codecs.oobleck_fast import decode_fused_for

B = int(os.environ.get("PROBE_BATCH", "4"))
T = 500
DT = jnp.bfloat16
REPS = 10

key = jax.random.PRNGKey(0)
vae = AudioVAE(channels=128, latent_dim=128, c_mults=(1, 2, 4, 8),
               strides=(2, 4, 6, 10), dtype=DT)
params = vae.init({"params": key, "sample": key},
                  jnp.zeros((1, 480 * 4, 1), DT))["params"]
z = jax.random.normal(key, (B, T, 128), DT)


def scan_time(fn, *args):
    @jax.jit
    def run(p, x0):
        def body(c, _):
            y = fn(p, c)
            return c + jnp.mean(y).astype(c.dtype), jnp.mean(y)
        _, ys = lax.scan(body, x0, None, length=REPS)
        return ys
    run(*args); jax.block_until_ready(run(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REPS


flax_fn = lambda p, zz: vae.apply({"params": p}, zz,
                                  method=lambda m, q: m.decoder(q))
fused_fn = lambda p, zz: decode_fused_for(vae, p, zz)

flops = 499e9 * B
t_flax = scan_time(flax_fn, params, z)
print(f"[decode flax/XLA]   {t_flax*1e3:6.1f} ms/batch{B}"
      f"  ~{flops/t_flax/1e12:.1f} TFLOP/s")
t_fused = scan_time(fused_fn, params, z)
print(f"[decode FUSED]      {t_fused*1e3:6.1f} ms/batch{B}"
      f"  ~{flops/t_fused/1e12:.1f} TFLOP/s  ({t_flax/t_fused:.2f}x)")

y0 = np.asarray(jax.jit(flax_fn)(params, z), np.float32)
y1 = np.asarray(jax.jit(fused_fn)(params, z), np.float32)
rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
print(f"[numerics] max rel err fused vs flax: {rel:.2e}")

# --- encode side (training per-batch VAE encode + editing/ControlNet) ---
from ezaudio_tpu.codecs.oobleck_fast import encode_fused_for

audio = jax.random.normal(key, (B, T * 480, 1), DT) * 0.1
enc_flax = lambda p, a: vae.apply({"params": p}, a,
                                  method=lambda m, q: m.encoder(q))
enc_fused = lambda p, a: encode_fused_for(vae, p, a)
t_ef = scan_time(enc_flax, params, audio)
print(f"[encode flax/XLA]   {t_ef*1e3:6.1f} ms/batch{B}")
t_eg = scan_time(enc_fused, params, audio)
print(f"[encode FUSED]      {t_eg*1e3:6.1f} ms/batch{B}  ({t_ef/t_eg:.2f}x)")
e0 = np.asarray(jax.jit(enc_flax)(params, audio), np.float32)
e1 = np.asarray(jax.jit(enc_fused)(params, audio), np.float32)
rel = np.abs(e1 - e0).max() / (np.abs(e0).max() + 1e-9)
print(f"[encode numerics] max rel err fused vs flax: {rel:.2e}")
