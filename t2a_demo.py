"""Text-to-audio demo CLI (reference t2a_demo.py equivalent).

Usage:
  python t2a_demo.py --prompt "a dog barking" --out out.wav \
      [--model s3_l] [--ckpt ... --vae ...] [--steps 100] [--length 10]

Without checkpoints the model runs with random weights (smoke mode) — the
published torch .pt files are converted on load when paths are given.
"""

import argparse

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a dog barking in the distance")
    ap.add_argument("--out", default="output.wav")
    ap.add_argument("--model", default="s3_l")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vae", default=None)
    ap.add_argument("--t5", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--length", type=float, default=10)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--guidance-scale", type=float, default=5.0)
    ap.add_argument("--guidance-rescale", type=float, default=0.75)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="the quality-validated fast recipe (BASELINE.md "
                    "round-4 flagship table): DPM-Solver++-25 + "
                    "layer_cache(2,2) + chunked-bf16 attention + int8 "
                    "linears + cfg_refresh(2)")
    args = ap.parse_args()

    from ezaudio_tpu.api.ezaudio import EzAudio
    from ezaudio_tpu.data.audio_io import save_wav

    ez = EzAudio(model_name=args.model, ckpt_path=args.ckpt,
                 vae_path=args.vae, t5_path=args.t5,
                 tokenizer_path=args.tokenizer,
                 dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    recipe = {}
    if args.fast:
        # gi(300,800) was demoted from this recipe by the depth-24
        # flagship quality validation (BASELINE.md round-4 table);
        # cfg_refresh(2) composes in anchor-neutral.
        recipe = dict(sampler="dpm", ddim_steps=25, layer_cache=(2, 2),
                      attn_impl="chunked_bf16", quant="int8",
                      cfg_refresh=2)
        recipe["ddim_steps"] = min(recipe["ddim_steps"], args.steps)
    sr, wav = ez.generate_audio(
        args.prompt, length=args.length,
        guidance_scale=args.guidance_scale,
        guidance_rescale=args.guidance_rescale, random_seed=args.seed,
        **{"ddim_steps": args.steps, **recipe})
    save_wav(args.out, wav, sr)
    print(f"wrote {args.out} ({len(wav) / sr:.1f}s @ {sr} Hz)")


if __name__ == "__main__":
    main()
