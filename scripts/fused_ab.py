"""Same-session staged-vs-fused A/B at the current fast recipe.

Re-run of the round-3 fused-pipeline refutation (BASELINE.md "Fused
single-dispatch pipeline A/B") now that guidance_interval(300,800) is in
the fast recipe: at p50 ~0.78 s the ~70 ms/dispatch tunnel overhead is a
double-digit share, so the earlier NEUTRAL verdict (measured at 851 ms)
could flip.  Median of 5, np.asarray-forced (CLAUDE.md timing rule).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ezaudio_tpu.api.ezaudio import EzAudio
from ezaudio_tpu.config import get_model_config
from ezaudio_tpu.text.t5 import T5EncoderConfig

MODEL = os.environ.get("BENCH_MODEL", "s3_xl")
BATCH = int(os.environ.get("BENCH_BATCH", "4"))

d = get_model_config(MODEL).model.context_dim
t5_cfg = T5EncoderConfig(vocab_size=512, d_model=d, d_kv=64,
                         d_ff=2 * d, num_layers=2, num_heads=8)
ez = EzAudio(model_name=MODEL, t5_config=t5_cfg, dtype=jnp.bfloat16)

prompts = ["a dog barking in the distance", "heavy rain on a tin roof",
           "a car engine starting", "birds chirping in a forest"]
prompts = (prompts * ((BATCH + 3) // 4))[:BATCH]

FAST = dict(ddim_steps=25, sampler="dpm", layer_cache=(2, 2),
            attn_impl="chunked_bf16", quant="int8",
            guidance_interval=(300.0, 800.0))
REF = dict(ddim_steps=100, sampler="ddim")


def measure(fused, **kw):
    kw = dict(length=10.0, fused=fused, **kw)
    ez.generate_audio(prompts, random_seed=0, **kw)  # warmup/compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        _, wav = ez.generate_audio(prompts, random_seed=i, **kw)
        np.asarray(wav)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


for name, kw in [("fast+gi recipe", FAST), ("reference recipe", REF)]:
    t_staged = measure(False, **kw)
    t_fused = measure(True, **kw)
    thr_s = BATCH * 10.0 / t_staged
    thr_f = BATCH * 10.0 / t_fused
    print(f"[{name}, staged] {t_staged*1e3:.0f} ms/batch{BATCH}"
          f" = {thr_s:.2f} audio-s/s/chip")
    print(f"[{name}, FUSED]  {t_fused*1e3:.0f} ms/batch{BATCH}"
          f" = {thr_f:.2f} audio-s/s/chip")
    print(f"  fused delta: {(t_staged/t_fused-1)*100:+.1f}%")
