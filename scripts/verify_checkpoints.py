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

The per-checkpoint checks are importable functions (``verify_vae``,
``verify_dit``, ``verify_controlnet``) so CI exercises this exact load/
report path on synthetic reference-format ``.pt`` fixtures
(tests/test_export.py::TestVerifyCheckpoints) — the first contact with
real weights should be boring.

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


def _count_reference(sd) -> int:
    """Element count of the reference state dict, excluding deterministic
    buffers the converter intentionally drops (rotary inv_freq, sinusoidal
    PE tables — regenerated in-graph on our side)."""
    return sum(
        int(np.prod(v.shape)) for k, v in sd.items()
        if "rotary.inv_freq" not in k and not k.endswith(".pe"))


def verify_vae(vae_path: str, vae_cfg: dict, num_blocks: int = 4,
               sine_seconds: float = 2.0) -> dict:
    """Load + convert a published-format VAE checkpoint
    (``{'state_dict': {'autoencoder.*', ... weight_g/weight_v}}``,
    reference load contract src/modules/stable_vae/__init__.py:25-28) and
    run the encode->decode sine round trip.  Returns a report dict."""
    from ezaudio_tpu.codecs.facade import AutoencoderFacade
    from ezaudio_tpu.codecs.oobleck import vae_from_config
    from ezaudio_tpu.convert.torch_to_jax import (
        convert_vae_state_dict, load_torch_checkpoint, strip_prefix)

    sd = strip_prefix(load_torch_checkpoint(vae_path, key="state_dict"),
                      "autoencoder.")
    params = convert_vae_state_dict(sd, num_blocks=num_blocks)
    facade = AutoencoderFacade(vae_from_config(vae_cfg), params)
    n_src = sum(int(np.prod(v.shape)) for v in sd.values())

    sr = int(vae_cfg.get("sample_rate", 24000))
    t = np.arange(int(sine_seconds * sr)) / sr
    f0 = min(440.0, sr / 8)
    wav = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    z = facade.encode(wav[None, :, None], sample=False)
    rec = np.asarray(facade.decode(z))[0, :, 0]
    from ezaudio_tpu.audio.metrics import si_sdr

    n = min(len(rec), len(wav))
    sdr = float(si_sdr(jnp.asarray(rec[None, :n]), jnp.asarray(wav[None, :n])))
    return {
        "converted_params": count_params(params),
        "reference_tensors": n_src,
        "roundtrip_si_sdr_db": sdr,
        "roundtrip_ok": sdr > 5,
        "finite": bool(np.isfinite(rec).all()),
    }


def verify_dit(dit_path: str, model_cfg: dict, context_len: int = 100) -> dict:
    """Load + convert a published-format DiT checkpoint
    (``{'model': state_dict}``, reference load contract api/ezaudio.py:84)
    and check conditioning liveness + finiteness.  Returns a report dict."""
    from ezaudio_tpu.convert.torch_to_jax import (
        convert_maskdit_state_dict, load_torch_checkpoint)
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    sd = load_torch_checkpoint(dit_path, key="model")
    params = {"params": convert_maskdit_state_dict(sd, model_cfg)}
    dit = maskdit_from_config(dict(model_cfg), dtype=jnp.bfloat16)
    n_src = _count_reference(sd)
    n_conv = count_params(params)

    key = jax.random.PRNGKey(0)
    L = model_cfg["img_size"] if isinstance(model_cfg, dict) else model_cfg.img_size
    C = model_cfg["out_chans"] if isinstance(model_cfg, dict) else model_cfg.out_chans
    D = model_cfg["context_dim"] if isinstance(model_cfg, dict) else model_cfg.context_dim
    x = jax.random.normal(key, (2, L, C), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, context_len, D), jnp.bfloat16)
    o_hi, _ = dit.apply(params, x, jnp.asarray([999, 999]), ctx)
    o_lo, _ = dit.apply(params, x, jnp.asarray([9, 9]), ctx)
    d = float(jnp.abs(o_hi.astype(jnp.float32) - o_lo.astype(jnp.float32)).mean())
    return {
        "converted_params": n_conv,
        "reference_tensors": n_src,
        "count_ok": n_conv == n_src,
        "t_conditioning_delta": d,
        # NB: a freshly *random-initialized* reference model is nearly
        # time-invariant (zero-init AdaLN heads); trained weights are not
        "t_conditioning_live": d > 1e-3,
        "finite": bool(jnp.isfinite(o_hi).all()),
    }


def verify_controlnet(cn_path: str, model_cfg: dict, cn_cfg: dict) -> dict:
    """Load + convert a published-format ControlNet checkpoint
    (``{'model': state_dict}``).  Returns a report dict."""
    from ezaudio_tpu.convert.torch_to_jax import (
        convert_controlnet_state_dict, load_torch_checkpoint)

    sd = load_torch_checkpoint(cn_path, key="model")
    params = convert_controlnet_state_dict(sd, model_cfg, cn_cfg)
    n_src = _count_reference(sd)
    n_conv = count_params(params)
    return {
        "converted_params": n_conv,
        "reference_tensors": n_src,
        "count_ok": n_conv == n_src,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit", default=None)
    ap.add_argument("--vae", default=None)
    ap.add_argument("--controlnet", default=None)
    ap.add_argument("--model", default="s3_l")
    args = ap.parse_args()

    from ezaudio_tpu.config import MODEL_REGISTRY, get_model_config

    cfg = get_model_config(args.model)

    if args.vae:
        import json

        with open(os.path.join(os.path.dirname(
                MODEL_REGISTRY["vae"]["config"]), "vae.json")) as f:
            vae_cfg = json.load(f)
        r = verify_vae(args.vae, vae_cfg)
        print(f"VAE params: converted={r['converted_params']:,} "
              f"(reference tensors total {r['reference_tensors']:,} "
              f"incl. unfolded v/g)")
        print(f"VAE round-trip SI-SDR on sine: {r['roundtrip_si_sdr_db']:.2f} dB "
              f"({'OK' if r['roundtrip_ok'] else 'SUSPICIOUS'})")

    if args.dit:
        r = verify_dit(args.dit, cfg.model.to_dict())
        print(f"DiT params: converted={r['converted_params']:,} "
              f"reference={r['reference_tensors']:,} "
              f"({'OK' if r['count_ok'] else 'MISMATCH'})")
        print(f"DiT t-conditioning delta |f(999)-f(9)|: "
              f"{r['t_conditioning_delta']:.4f} "
              f"({'OK' if r['t_conditioning_live'] else 'SUSPICIOUS'}); "
              f"finite={r['finite']}")

    if args.controlnet:
        r = verify_controlnet(args.controlnet, cfg.model.to_dict(),
                              cfg.controlnet.to_dict())
        print(f"ControlNet params: converted={r['converted_params']:,} "
              f"reference={r['reference_tensors']:,} "
              f"({'OK' if r['count_ok'] else 'MISMATCH'})")


if __name__ == "__main__":
    main()
