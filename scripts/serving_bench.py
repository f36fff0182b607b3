"""Serving benchmark: sustained throughput + latency under Poisson load.

Drives ezaudio_tpu.serving.GenerationServer (micro-batching into
jit-cached bucket sizes) with Poisson request arrivals at a configured
offered load, and reports achieved throughput, p50/p95 end-to-end request
latency, and batching efficiency.  This is the production-serving figure
of merit the per-call bench cannot show: how well the scheduler converts
concurrency into MXU batch efficiency.

Run:  python -u scripts/serving_bench.py [offered_rps ...]
Env:  SERVE_RECIPE=fast|default   (fast = DPM-25 + layer_cache(2,2),
      the quality-validated recipe from BASELINE.md)
      SERVE_SECONDS=60            window per load point
      SERVE_MAX_BATCH=8
      SERVE_MIXED=1               heterogeneous workload: request lengths
                                  drawn 50/50 from {5 s, 10 s} (served via
                                  length buckets); reports per-length p50/p99
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PROMPTS = [
    "a dog barking in the distance", "heavy rain on a tin roof",
    "a car engine starting", "birds chirping in a forest",
    "footsteps on gravel", "a phone ringing in another room",
    "waves crashing on a beach", "an espresso machine steaming milk",
]


def main():
    rates = [float(r) for r in sys.argv[1:]] or [0.5, 1.0, 2.0]
    recipe = os.environ.get("SERVE_RECIPE", "fast")
    window = float(os.environ.get("SERVE_SECONDS", "60"))
    max_batch = int(os.environ.get("SERVE_MAX_BATCH", "8"))

    from ezaudio_tpu.api.ezaudio import EzAudio
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.serving import GenerationServer
    from ezaudio_tpu.text.t5 import T5EncoderConfig

    d = get_model_config("s3_xl").model.context_dim
    t5 = T5EncoderConfig(vocab_size=512, d_model=d, d_kv=64, d_ff=2 * d,
                         num_layers=2, num_heads=8)
    ez = EzAudio(model_name="s3_xl", t5_config=t5, dtype=jnp.bfloat16)

    mixed = os.environ.get("SERVE_MIXED", "0") == "1"
    lengths = (5.0, 10.0) if mixed else (10.0,)

    kw = (dict(ddim_steps=25, sampler="dpm", layer_cache=(2, 2),
               attn_impl="chunked_bf16", quant="int8")
          if recipe == "fast" else dict(ddim_steps=100))
    # SERVE_FUSED=1: the single-dispatch pipeline (one program per
    # batch x length bucket); SERVE_AB=1 runs staged THEN fused in one
    # session (cross-session tunnel variance is ±25%, so only a
    # same-session A/B is meaningful)
    variants = ([False, True] if os.environ.get("SERVE_AB", "0") == "1"
                else [os.environ.get("SERVE_FUSED", "0") == "1"])
    for fused in variants:
        kw["fused"] = fused
        run_variant(ez, GenerationServer, kw, rates, window, max_batch,
                    mixed, lengths, f"{recipe}{'/fused' if fused else ''}")


def run_variant(ez, GenerationServer, kw, rates, window, max_batch,
                mixed, lengths, recipe):
    server = GenerationServer(ez, max_batch_size=max_batch,
                              max_wait_ms=200.0, length=10.0,
                              length_buckets=lengths, **kw).start()

    # warm every (batch bucket x length bucket) so steady-state never
    # pays a compile
    print(f"warming jit buckets {server.buckets} x lengths {lengths} "
          f"({recipe} recipe)...", flush=True)
    for b in server.buckets:
        for L in lengths:
            # the server dispatches with per-slot initial_latents — warm
            # the same program variant (fused keys on draw-vs-provided)
            lat = np.stack([server._slot_noise(i, L) for i in range(b)])
            texts = [PROMPTS[i % len(PROMPTS)] for i in range(b)]
            ez.generate_audio(texts, random_seed=0, length=L,
                              guidance_scale=5.0, guidance_rescale=0.75,
                              initial_latents=lat, **kw)

    rng = np.random.default_rng(0)
    for rps in rates:
        lat, lock = {L: [] for L in lengths}, threading.Lock()
        t_end = time.perf_counter() + window
        futures = []
        n_sent = 0
        audio_s_served = 0.0
        server.stats.update(batches=0, padded_slots=0)
        while time.perf_counter() < t_end:
            gap = rng.exponential(1.0 / rps)
            time.sleep(gap)
            t0 = time.perf_counter()
            L = lengths[n_sent % len(lengths)] if mixed else lengths[0]
            f = server.submit(PROMPTS[n_sent % len(PROMPTS)], seed=n_sent,
                              length=L)
            f.add_done_callback(
                lambda fut, t0=t0, L=L: (
                    lock.acquire(),
                    lat[L].append(time.perf_counter() - t0),
                    lock.release()))
            futures.append(f)
            n_sent += 1
            audio_s_served += L
        for f in futures:
            f.result(timeout=600)
        all_lat = np.array(sorted(v for vs in lat.values() for v in vs))
        done = len(all_lat)
        pad = server.stats["padded_slots"]
        eff = done / max(1, done + pad)  # fraction of slots doing real work
        per_len = "  ".join(
            f"{L:.0f}s: p50 {np.percentile(ls, 50):.2f}s "
            f"p99 {np.percentile(ls, 99):.2f}s (n={len(ls)})"
            for L, ls in sorted(lat.items()) if ls)
        print(f"[{recipe}{'/mixed' if mixed else ''}] offered {rps:.2f} "
              f"req/s: served {done} in {window:.0f}s "
              f"({done/window:.2f} req/s = {audio_s_served/window:.1f} "
              f"audio-s/s), p50 {np.percentile(all_lat, 50):.2f}s "
              f"p99 {np.percentile(all_lat, 99):.2f}s | {per_len} | "
              f"{server.stats['batches']} batches, slot-fill {eff:.0%}",
              flush=True)
    server.stop()


if __name__ == "__main__":
    main()
