"""Energy-conditioned ControlNet demo CLI (reference controlnet_demo.py
equivalent).

Usage:
  python controlnet_demo.py --prompt "dog barking" --ref ref.wav --out out.wav
"""

import argparse

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a dog barking")
    ap.add_argument("--ref", required=True, help="reference wav for energy")
    ap.add_argument("--out", default="output.wav")
    ap.add_argument("--model", default="energy")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--controlnet", default=None)
    ap.add_argument("--vae", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance-scale", type=float, default=3.5)
    ap.add_argument("--conditioning-scale", type=float, default=1.0)
    ap.add_argument("--surpass-noise", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from ezaudio_tpu.api.controlnet import EzAudioControlNet
    from ezaudio_tpu.data.audio_io import save_wav

    ez = EzAudioControlNet(
        model_name=args.model, ckpt_path=args.ckpt,
        controlnet_path=args.controlnet, vae_path=args.vae,
        tokenizer_path=args.tokenizer,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    sr, wav = ez.generate_audio(
        args.prompt, args.ref, surpass_noise=args.surpass_noise,
        ddim_steps=args.steps, guidance_scale=args.guidance_scale,
        conditioning_scale=args.conditioning_scale, random_seed=args.seed)
    save_wav(args.out, wav, sr)
    print(f"wrote {args.out} ({len(wav) / sr:.1f}s @ {sr} Hz)")


if __name__ == "__main__":
    main()
