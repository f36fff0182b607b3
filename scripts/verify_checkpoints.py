"""Checkpoint conversion verification (for use when the published torch
checkpoints are available locally).

Checks, per checkpoint:
  * every reference parameter is consumed by the converter (no silent
    drops) and every converted leaf matches a model param shape;
  * VAE: encode->decode round trip on a sine produces SI-SDR > 5 dB
    (sanity that weight-norm folding + layout transposition are right);
  * DiT: forward at t=999 vs t=9 differ (AdaLN conditioning live) and
    CFG-paired outputs are finite;
  * prints parameter-count summaries for eyeballing vs the reference.

Usage:
  python scripts/verify_checkpoints.py --dit ckpts/s3/ezaudio_s3_l.pt \
      --vae ckpts/vae/1m.pt [--model s3_l]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit", default=None)
    ap.add_argument("--vae", default=None)
    ap.add_argument("--controlnet", default=None)
    ap.add_argument("--model", default="s3_l")
    args = ap.parse_args()

    from ezaudio_tpu.config import get_model_config

    cfg = get_model_config(args.model)

    if args.vae:
        from ezaudio_tpu.codecs.facade import AutoencoderFacade
        from ezaudio_tpu.codecs.oobleck import vae_from_config
        from ezaudio_tpu.config import MODEL_REGISTRY
        import json

        from ezaudio_tpu.convert.torch_to_jax import (
            convert_vae_state_dict, load_torch_checkpoint, strip_prefix)

        sd = strip_prefix(load_torch_checkpoint(args.vae, key="state_dict"),
                          "autoencoder.")
        params = convert_vae_state_dict(sd)
        with open(os.path.join(os.path.dirname(
                MODEL_REGISTRY["vae"]["config"]), "vae.json")) as f:
            vae_cfg = json.load(f)
        facade = AutoencoderFacade(vae_from_config(vae_cfg), params)
        n_src = sum(v.size for k, v in sd.items() if "weight_v" not in k) \
            + sum(v.size for k, v in sd.items() if "weight_v" in k)
        print(f"VAE params: converted={count_params(params):,} "
              f"(reference tensors total {n_src:,} incl. unfolded v/g)")

        sr = 24000
        t = np.arange(2 * sr) / sr
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        z = facade.encode(wav[None, :, None], sample=False)
        rec = np.asarray(facade.decode(z))[0, :, 0]
        from ezaudio_tpu.audio.metrics import si_sdr

        n = min(len(rec), len(wav))
        sdr = float(si_sdr(jnp.asarray(rec[None, :n]), jnp.asarray(wav[None, :n])))
        print(f"VAE round-trip SI-SDR on 440 Hz sine: {sdr:.2f} dB "
              f"({'OK' if sdr > 5 else 'SUSPICIOUS'})")

    if args.dit:
        from ezaudio_tpu.convert.torch_to_jax import (
            convert_maskdit_state_dict, load_torch_checkpoint)
        from ezaudio_tpu.models.maskdit import maskdit_from_config

        sd = load_torch_checkpoint(args.dit, key="model")
        params = {"params": convert_maskdit_state_dict(sd, cfg.model)}
        dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
        n_src = sum(v.size for v in sd.values())
        print(f"DiT params: converted={count_params(params):,} "
              f"reference={n_src:,} "
              f"({'OK' if count_params(params) == n_src else 'MISMATCH'})")

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, cfg.model.img_size, cfg.model.out_chans),
                              jnp.bfloat16)
        ctx = jax.random.normal(key, (2, 100, cfg.model.context_dim), jnp.bfloat16)
        o_hi, _ = dit.apply(params, x, jnp.asarray([999, 999]), ctx)
        o_lo, _ = dit.apply(params, x, jnp.asarray([9, 9]), ctx)
        d = float(jnp.abs(o_hi - o_lo).mean())
        print(f"DiT t-conditioning delta |f(999)-f(9)|: {d:.4f} "
              f"({'OK' if d > 1e-3 else 'SUSPICIOUS'}); finite="
              f"{bool(jnp.isfinite(o_hi).all())}")

    if args.controlnet:
        from ezaudio_tpu.convert.torch_to_jax import (
            convert_controlnet_state_dict, load_torch_checkpoint)

        sd = load_torch_checkpoint(args.controlnet, key="model")
        params = convert_controlnet_state_dict(sd, cfg.model, cfg.controlnet)
        n_src = sum(v.size for v in sd.values())
        print(f"ControlNet params: converted={count_params(params):,} "
              f"reference={n_src:,} "
              f"({'OK' if count_params(params) == n_src else 'MISMATCH'})")


if __name__ == "__main__":
    main()
