"""Measure the four BASELINE.json configs never benched before, one session.

BASELINE.json names five measurement configs; bench.py covers #2 (s3_xl
batched multi-prompt).  This probe measures the rest end-to-end through the
public APIs on whatever accelerator is attached:

  1. s3_l single-prompt 10 s clip, 50-step DDIM+CFG   (reference api defaults)
  2. s3_xl editing/inpainting, 100-step, guidance 3.5  (api/ezaudio.py:132-134)
  3. ControlNet energy-conditioned, 50-step            (api/controlnet.py:113-118)
  4. s3_xl T2A diffusion training step                 (src/train.py recipe)

All timings are medians of 3 with np.asarray materialization (the tunnel's
block_until_ready under-reports); compare within ONE session only.

Run:  python -u scripts/perf_probe9.py [sections...]   (default: all)
"""

import gc
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


def timed(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def tiny_t5(model_name):
    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.text.t5 import T5EncoderConfig

    d = get_model_config(model_name).model.context_dim
    return T5EncoderConfig(vocab_size=512, d_model=d, d_kv=64, d_ff=2 * d,
                           num_layers=2, num_heads=8)


def bench_s3_l_single():
    """Config 1: s3_l, single prompt, 10 s, 50-step DDIM+CFG defaults."""
    from ezaudio_tpu.api.ezaudio import EzAudio

    ez = EzAudio(model_name="s3_l", t5_config=tiny_t5("s3_l"),
                 dtype=jnp.bfloat16)
    t = timed(lambda: np.asarray(ez.generate_audio(
        "a dog barking in the distance", length=10.0, ddim_steps=50,
        random_seed=0)[1]))
    print(f"[1] s3_l single-prompt 50-step DDIM+CFG: {t:.2f} s / 10 s clip "
          f"-> {10.0 / t:.2f} audio-s/s/chip")
    del ez
    gc.collect()


def bench_editing():
    """Config 3: s3_xl editing_audio, reference defaults (100 steps, g=3.5)."""
    from ezaudio_tpu.api.ezaudio import EzAudio

    ez = EzAudio(model_name="s3_xl", t5_config=tiny_t5("s3_xl"),
                 dtype=jnp.bfloat16)
    sr = ez.sr
    gt = (0.3 * np.sin(2 * np.pi * 220 * np.arange(10 * sr) / sr)
          ).astype(np.float32)
    t = timed(lambda: np.asarray(ez.editing_audio(
        "a dog barking", boundary=2.0, gt_file=gt, mask_start=3.0,
        mask_length=4.0, guidance_scale=3.5, guidance_rescale=0.0,
        ddim_steps=100, random_seed=0)[1]))
    # the regenerated region is 4 s; conservative metric counts the whole clip
    print(f"[3] s3_xl editing 100-step (4 s mask in 10 s clip): {t:.2f} s "
          f"-> {10.0 / t:.2f} audio-s/s/chip")
    del ez
    gc.collect()
    return t


def bench_controlnet():
    """Config 4: ControlNet energy-conditioned, reference defaults (50 steps)."""
    from ezaudio_tpu.api.controlnet import EzAudioControlNet

    cn = EzAudioControlNet(model_name="energy", t5_config=tiny_t5("energy"),
                           dtype=jnp.bfloat16)
    sr = cn.base.sr
    ref_audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(10 * sr) / sr)
                 ).astype(np.float32)
    t = timed(lambda: np.asarray(cn.generate_audio(
        "a dog barking", ref_audio, ddim_steps=50, random_seed=0)[1]))
    print(f"[4] ControlNet energy 50-step: {t:.2f} s / 10 s clip "
          f"-> {10.0 / t:.2f} audio-s/s/chip")
    del cn
    gc.collect()
    return t


def bench_train_step(batches=None):
    """Config 5: s3_xl T2A diffusion training step (reference recipe:
    batch 16 x accum 2 per A100-80GB; one v5e-1 has 16 GB, and f32
    params+Adam+grads for the 760M DiT are ~12 GB, so the single-chip
    fit is small-batch + grad accumulation — production shards the
    optimizer over fsdp (see test_flagship_fsdp).  Env:
    PROBE9_TRAIN_BATCHES=4,8 (run one batch per process: a failed OOM
    step leaves the allocator fragmented)."""
    import optax

    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

    cfg = get_model_config("s3_xl")
    L, C, D = cfg.model.img_size, cfg.model.out_chans, cfg.model.context_dim
    dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 8, D), jnp.bfloat16))["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    schedule = DDIMSchedule.from_config(cfg.diff.to_dict())
    tx = optax.adamw(5e-5, b1=0.9, b2=0.95, weight_decay=0.01)
    step = make_train_step(dit, schedule, tx, snr_gamma=5.0)
    state = TrainState.create(params, tx)

    if batches is None:
        batches = [int(b) for b in os.environ.get(
            "PROBE9_TRAIN_BATCHES", "4").split(",")]
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
            t = timed(run)
        except Exception as e:  # noqa: BLE001 — OOM at this batch is a result
            print(f"[5] s3_xl train step batch {B}: FAILED ({type(e).__name__})")
            continue
        # fwd FLOPs ~= 2 * n_params * tokens; train ~= 3x fwd
        tok = B * L
        tflops = 3 * 2 * n_params * tok / 1e12
        print(f"[5] s3_xl train step batch {B}: {t * 1e3:.0f} ms "
              f"({1.0 / t:.2f} it/s, {B * 10.0 / t:.1f} audio-s/s/chip, "
              f"~{tflops / t:.1f} TFLOP/s, {n_params / 1e6:.0f}M params)")


SECTIONS = {"s3_l": bench_s3_l_single, "editing": bench_editing,
            "controlnet": bench_controlnet, "train": bench_train_step}

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    print("devices:", jax.devices())
    for name in names:
        SECTIONS[name]()
