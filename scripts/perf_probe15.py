"""probe15: batch-size sweep of the FULL fast-recipe pipeline, one session.

The bench headline fixes BENCH_BATCH=4, chosen back when batch 8/16 paid a
per-sample penalty (probe4's transfer pathology, since fixed by pipelined
VAE dispatch) and before the fused ResidualUnit decode kernel (probe14).
Both changes shift the optimum: decode is cheaper and the dispatch
pipeline hides more of the per-chunk latency at larger batches.  This
probe measures audio-s/s/chip for the EXACT bench fast recipe (DPM-25 +
layer_cache(2,2) + chunked_bf16 + int8 + cfg_refresh(2); gi demoted by
the depth-24 quality table, BASELINE.md) at batch 4/8/16 in ONE session,
so the ratios are tunnel-variance-free.  The 2026-08-19 runbook sweep
(docs/evidence/r4rb_probe15.log) ran the r3 gi-variant of the recipe and
batch 8 won there (58.87 vs 56.57); this script now sweeps the r4
recipe itself (re-sweep queued in scripts/r4_tpu_runbook2.sh ->
docs/evidence/r4rb2_probe15.log) to confirm the batch-8 BENCH_BATCH
default on the exact shipped recipe.

Single-chip only by construction: EzAudio is built with mesh=None, so
per-chip == total; if a BENCH_CHIPS-style mesh is ever added here, divide
throughput by mesh.size like bench.py does.

Run ON the TPU: python scripts/perf_probe15.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from ezaudio_tpu.api.ezaudio import EzAudio
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.text.t5 import T5EncoderConfig

    model_name = os.environ.get("BENCH_MODEL", "s3_xl")
    d = get_model_config(model_name).model.context_dim
    t5_cfg = T5EncoderConfig(vocab_size=512, d_model=d, d_kv=64,
                             d_ff=2 * d, num_layers=2, num_heads=8)
    ez = EzAudio(model_name=model_name, t5_config=t5_cfg, dtype=jnp.bfloat16)

    base_prompts = [
        "a dog barking in the distance",
        "heavy rain on a tin roof",
        "a car engine starting",
        "birds chirping in a forest",
    ]
    recipe = dict(length=10.0, ddim_steps=25, sampler="dpm",
                  layer_cache=(2, 2), attn_impl="chunked_bf16",
                  quant="int8", cfg_refresh=2)

    batches = [int(b) for b in
               os.environ.get("PROBE15_BATCHES", "4,8,16").split(",")]
    rows = []
    for batch in batches:
        prompts = (base_prompts * ((batch + 3) // 4))[:batch]
        ez.generate_audio(prompts, random_seed=0, **recipe)  # compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            sr, wav = ez.generate_audio(prompts, random_seed=i, **recipe)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        thr = batch * 10.0 / t
        rows.append((batch, t, thr))
        print(f"batch {batch:3d}: p50 {t:6.3f} s  ->  {thr:7.2f} "
              f"audio-s/s/chip", flush=True)

    best = max(rows, key=lambda r: r[2])
    print(f"\nbest: batch {best[0]} at {best[2]:.2f} audio-s/s/chip "
          f"({best[2] / rows[0][2]:.3f}x batch-{rows[0][0]})")


if __name__ == "__main__":
    main()
