"""Train-step memory/speed A/B at s3_xl, one session (round 2).

State donation (trainer.py) freed ~12 GB of double-buffered optimizer
state, which reopens the remat question: per-block full recompute
(`use_checkpoint: true`, the reference's setting) pays ~1/3 extra FLOPs
in the backward.  With donation, do the activations fit WITHOUT remat at
serving-relevant batches?  And do bf16 Adam moments (3 GB saved) buy a
bigger batch?

Variants (each in its own process — OOM fragments the allocator):
  remat    — use_checkpoint=True, f32 Adam (current default)
  noremat  — use_checkpoint=False, f32 Adam
  bf16mu   — use_checkpoint=True, bf16 Adam moments
  nr+bf16  — use_checkpoint=False, bf16 Adam moments

Run:  PROBE10_VARIANT=noremat PROBE10_BATCHES=4,8 python -u scripts/perf_probe10.py
"""

import os
import sys
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

VARIANTS = {
    "remat": dict(use_checkpoint=True, mu_dtype=None),
    "noremat": dict(use_checkpoint=False, mu_dtype=None),
    "bf16mu": dict(use_checkpoint=True, mu_dtype=jnp.bfloat16),
    "nr+bf16": dict(use_checkpoint=False, mu_dtype=jnp.bfloat16),
}


def main():
    import optax

    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

    name = os.environ.get("PROBE10_VARIANT", "remat")
    batches = [int(b) for b in os.environ.get(
        "PROBE10_BATCHES", "4,8").split(",")]
    v = VARIANTS[name]

    cfg = get_model_config("s3_xl")
    model_cfg = dict(cfg.model.to_dict(), use_checkpoint=v["use_checkpoint"])
    L, C, D = cfg.model.img_size, cfg.model.out_chans, cfg.model.context_dim
    dit = maskdit_from_config(model_cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 8, D), jnp.bfloat16))["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    schedule = DDIMSchedule.from_config(cfg.diff.to_dict())
    tx = optax.adamw(5e-5, b1=0.9, b2=0.95, weight_decay=0.01,
                     mu_dtype=v["mu_dtype"])
    step = make_train_step(dit, schedule, tx, snr_gamma=5.0)
    state = TrainState.create(params, tx)

    for B in batches:
        batch = {
            "latents": jax.random.normal(key, (B, L, C), jnp.float32),
            "text": jax.random.normal(key, (B, 50, D), jnp.bfloat16),
            "text_mask": jnp.ones((B, 50), bool),
            "uncond": jax.random.normal(key, (1, 50, D), jnp.bfloat16),
            "uncond_mask": jnp.ones((1, 50), bool),
        }
        try:
            def run():
                nonlocal state
                state, m = step(state, batch, key)
                np.asarray(m["loss"])
            run()  # compile + warmup
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
        except Exception as e:  # noqa: BLE001 — OOM at this size is a result
            print(f"[{name}] B={B}: FAILED ({type(e).__name__})", flush=True)
            break  # allocator is fragmented now; later batches unreliable
        tflops = 3 * 2 * n_params * B * L / 1e12
        print(f"[{name}] B={B}: {t * 1e3:.0f} ms ({B * 10.0 / t:.1f} "
              f"audio-s/s trained, ~{tflops / t:.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
