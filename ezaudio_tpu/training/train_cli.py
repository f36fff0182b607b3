"""Training entry point: ``python -m ezaudio_tpu.training.train_cli``.

Behavioral parity with reference ``src/train.py``:
  * two-stage switch: ``context_dim: null`` -> MAE pretrain (no text), else
    text-to-audio stage (src/train.py:174-180);
  * per-step pipeline: VAE-encode batch -> scale_shift -> noise + uniform
    timesteps -> v/epsilon target -> MaskDiT with span-mask MAE -> masked
    (min-SNR) MSE -> clipped AdamW with warmup (src/train.py:262-313);
  * 10% caption CFG dropout (inside the jitted step, vs the reference's
    host-side swap, train.py:109-127);
  * txt logging every ``log_step``; checkpoint every ``save_every_step``
    (orbax full train state: params + optimizer + step);
  * fine-tune resume from a converted torch checkpoint (``--ckpt``).

TPU design: VAE encode + T5 encode + train step each are single jitted
programs; batches shard over the dp(+fsdp) mesh; an epoch is a host loop
feeding device-resident steps.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-name", type=str, required=True)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--save-every-step", type=int, default=5000)
    p.add_argument("--random-seed", type=int, default=2024)
    p.add_argument("--log-step", type=int, default=100)
    p.add_argument("--log-dir", type=str, default="../logs/")
    p.add_argument("--save-dir", type=str, default="../ckpts/")
    p.add_argument("--ckpt", type=str, default=None,
                   help="torch .pt to fine-tune from (converted on load)")
    p.add_argument("--vae-ckpt", type=str, default=None)
    p.add_argument("--mesh-fsdp", type=int, default=1)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", type=str, default=None,
                   choices=["full", "dots", "off"],
                   help="activation-remat policy (probe12: 'off' is the "
                        "fastest that fits at batch<=8 single-chip, 'dots' "
                        "the memory/speed middle ground, 'full' the min-"
                        "memory fallback; default: model config)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ezaudio_tpu.api.ezaudio import EzAudio
    from ezaudio_tpu.config import load_yaml_with_includes
    from ezaudio_tpu.data.dataset import EACaps, ResumableIterator
    from ezaudio_tpu.parallel.mesh import make_mesh
    from ezaudio_tpu.training.trainer import Trainer

    params_cfg = load_yaml_with_includes(args.config_name)
    if args.remat is not None:
        # probe12 (BASELINE.md round-3 MFU table): remat=off is the fastest
        # single-chip recipe that fits at batch<=8; dots the middle ground
        if args.remat == "off":
            params_cfg.model.use_checkpoint = False
        else:
            params_cfg.model.use_checkpoint = True
            params_cfg.model.remat_policy = args.remat
    stage = "audioset" if params_cfg.model.context_dim is None else "audiocaps"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # Model stack (random init or fine-tune ckpt); EzAudio bundles
    # DiT + VAE + T5 + schedule construction and conversion.
    ez = EzAudio(config=params_cfg.to_dict(), ckpt_path=args.ckpt,
                 vae_path=args.vae_ckpt, dtype=dtype, seed=args.random_seed)

    mesh = make_mesh(fsdp=args.mesh_fsdp)
    train_cfg = params_cfg.data.train.to_dict()
    # CFG dropout happens exactly once (reference train.py:109-127): in the
    # dataset when offline embeddings carry their own cfg_prob, else inside
    # the jitted step at the configured rate
    offline_cfg = bool(train_cfg.get("text_path")) and \
        float(train_cfg.get("cfg_prob", 0.0)) > 0
    cfg_dropout = 0.0 if offline_cfg else float(
        params_cfg.get("text_encoder", {}).get("cfg", 0.1) or 0.0)
    trainer = Trainer.create(
        ez.dit, ez.noise_scheduler, ez.dit_params["params"],
        params_cfg.opt.to_dict() if "opt" in params_cfg else {},
        mesh=mesh, scale=ez.scale, shift=ez.shift,
        train_frames=params_cfg.get("data", {}).get("train_frames"),
        cfg_dropout=cfg_dropout)

    train_set = EACaps(**train_cfg, seed=args.random_seed)
    batch_size = params_cfg.opt.batch_size
    it = ResumableIterator(train_set, batch_size, seed=args.random_seed)

    # precomputed uncond embedding for CFG dropout
    uncond, uncond_mask = (None, None)
    if stage == "audiocaps":
        uncond, uncond_mask = ez.embed_text([""])

    log_dir = os.path.join(args.log_dir, params_cfg.model_name)
    save_dir = os.path.join(args.save_dir, params_cfg.model_name)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(save_dir, exist_ok=True)

    # fault tolerance: auto-resume from the latest checkpoint if one exists
    # (preemption-safe restart; orbax state includes params+optimizer+step)
    latest = None
    try:
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(os.path.abspath(save_dir)) as _m:
            latest = _m.latest_step()
    except Exception:
        latest = None  # no checkpoint directory yet
    if latest is not None and args.ckpt is None:
        # a broken/incompatible checkpoint must fail loudly — silently
        # restarting from step 0 both loses progress and collides with the
        # existing step numbers at the next periodic save
        print(f"resuming from checkpoint step {latest}")
        trainer.restore_checkpoint(os.path.abspath(save_dir), latest)

    rng = jax.random.PRNGKey(args.random_seed)
    losses, t0 = [], time.time()
    global_step = int(trainer.state.step)
    steps_per_epoch = max(1, len(train_set) // batch_size)
    it.load_state_dict({"epoch": global_step // steps_per_epoch,
                        "step": global_step % steps_per_epoch})
    encode_key = jax.random.PRNGKey(args.random_seed + 1)

    from ezaudio_tpu.training.trainer import PreemptionGuard

    guard = PreemptionGuard().__enter__()
    try:
        for batch in it:
            # host->device: VAE encode + text encode (both jitted)
            latents = ez.autoencoder.encode(
                jnp.asarray(batch["audio"])[:, :, None],
                key=jax.random.fold_in(encode_key, global_step))
            if stage == "audiocaps":
                if "text_mask" in batch:  # offline embeddings
                    text, text_mask = jnp.asarray(batch["text"]), jnp.asarray(batch["text_mask"])
                else:
                    text, text_mask = ez.embed_text(batch["text"])
            else:
                text, text_mask = None, None

            step_batch = {"latents": latents, "text": text, "text_mask": text_mask,
                          "uncond": uncond, "uncond_mask": uncond_mask}
            # train_step shards internally; keep the loss on device so the
            # host never blocks on the ~70 ms tunnel round-trip per step
            metrics = trainer.train_step(step_batch, rng)
            losses.append(metrics["loss"])
            global_step += 1

            if global_step % args.log_step == 0:
                window = [float(v) for v in losses[-args.log_step:]]
                # only the last log window is ever read — drop older entries
                # so long runs don't accumulate unbounded live device buffers
                del losses[:-args.log_step]
                msg = (f"{time.asctime()}  step {global_step}  "
                       f"loss {np.mean(window):.6f}  "
                       f"({args.log_step / (time.time() - t0):.2f} it/s)\n")
                with open(os.path.join(log_dir, "log.txt"), "a") as f:
                    f.write(msg)
                print(msg, end="")
                t0 = time.time()

            if global_step % args.save_every_step == 0:
                # async: the write overlaps the next steps (trainer.py)
                trainer.save_checkpoint(os.path.abspath(save_dir), global_step,
                                        block=False)

            if guard.preempted:
                print(f"preemption signal: checkpointing at step {global_step} "
                      "and exiting (auto-resume picks this up on restart)")
                break

            if args.max_steps and global_step >= args.max_steps:
                break

        # final BLOCKING save runs while the guard is still active, so a
        # second SIGTERM during the (possibly long) write is absorbed
        # instead of killing the process mid-checkpoint.  When the loop
        # exited exactly on a periodic-save boundary, our CheckpointManager
        # options make the duplicate-step save return False and SKIP
        # silently (it does NOT raise) — skip_existing waits for the async
        # write instead, so the final state is never silently dropped
        if global_step % args.save_every_step != 0:
            trainer.save_checkpoint(os.path.abspath(save_dir), global_step)
        else:
            trainer.save_checkpoint(os.path.abspath(save_dir), global_step,
                                    block=True, skip_existing=True)
    finally:
        guard.__exit__()
        trainer.close()
    return trainer


if __name__ == "__main__":
    main()
