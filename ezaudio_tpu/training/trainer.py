"""Data-parallel diffusion trainer: one jitted step over a device mesh.

Behavioral parity with the reference training loop (src/train.py:170-341):
  * two-stage switch: ``context_dim is None`` -> MAE pretrain (no text),
    else text-to-audio stage;
  * per step: latent scale_shift, noise + uniform timestep, epsilon/v
    target, MaskDiT forward with gt (span-mask MAE), masked MSE with
    optional min-SNR weighting, grad clip, warmup LR, AdamW with the
    decay/no-decay split, gradient accumulation;
  * 10% text-CFG dropout — here a ``jnp.where`` swap to a precomputed
    uncond (empty-prompt) embedding INSIDE the jitted step (the reference's
    offline-cache path, dataset/audiocaps_v2.py:106-113, minus the host
    round trip);
  * checkpoint/resume via orbax (reference: torch.save + accelerate state,
    src/train.py:333-340).

TPU design: the full step (VAE-encoded latents in, loss out) is one jit;
the batch axis is sharded over the ``dp``(+``fsdp``) mesh axes and XLA
inserts the gradient all-reduce; parameters/optimizer state follow
``param_shardings`` (replicated, or ZeRO-sharded over ``fsdp``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.maskdit import MaskDiT
from ezaudio_tpu.training.losses import masked_diffusion_loss
from ezaudio_tpu.utils import scale_shift


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_train_step(
    model: MaskDiT,
    schedule: DDIMSchedule,
    tx: optax.GradientTransformation,
    scale: float = 1.0,
    shift: float = 0.0,
    snr_gamma: Optional[float] = None,
    cfg_dropout: float = 0.1,
    train_frames: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Build the jitted train step.

    step(state, batch, rng) -> (state, metrics)
    batch: dict with
      latents   (B, L, C)  VAE-encoded audio (pre-scale_shift)
      text      (B, Lc, D) or None       text embeddings
      text_mask (B, Lc) bool or None
      uncond    (1, Lc, D) or None       empty-prompt embedding (CFG dropout)
      uncond_mask (1, Lc) bool or None
    """

    def loss_fn(params, batch, rng):
        k_noise, k_t, k_mask, k_cfg = jax.random.split(rng, 4)
        latents = scale_shift(batch["latents"], scale, shift)
        if train_frames is not None:
            latents = latents[:, :train_frames]
        B = latents.shape[0]

        text = batch.get("text")
        text_mask = batch.get("text_mask")
        if text is not None and cfg_dropout > 0 and batch.get("uncond") is not None:
            drop = jax.random.uniform(k_cfg, (B,)) < cfg_dropout
            text = jnp.where(drop[:, None, None], batch["uncond"], text)
            text_mask = jnp.where(drop[:, None], batch["uncond_mask"], text_mask)

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)
        if schedule.prediction_type == "epsilon":
            target = noise
        elif schedule.prediction_type == "v_prediction":
            target = schedule.get_velocity(latents, noise, t)
        else:
            raise NotImplementedError(schedule.prediction_type)

        pred, mask = model.apply(
            {"params": params}, noisy, t, text, context_mask=text_mask,
            gt=latents, train=True, rngs={"mask": k_mask})
        loss = masked_diffusion_loss(pred, target, mask, schedule, t, snr_gamma)
        return loss

    # state is DONATED: params + optimizer moments (~12 GB f32 at s3_xl
    # scale) alias into the updated state instead of doubling peak HBM —
    # without this the single-chip XL train step does not fit on a 16 GB
    # v5e (measured, perf_probe9).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def step(state: TrainState, batch, rng):
        # Training always traces with quantization force-disabled: int8
        # round() has zero gradient, so a lingering EZAUDIO_QUANT=int8 would
        # silently stall training (quant is inference-only by design).
        import contextlib

        from ezaudio_tpu.ops.quant import quant_context

        # On a batch-parallel mesh, pin block activations to batch sharding
        # during tracing (parallel/mesh.py::activation_sharding) — this
        # forces the classic fsdp plan (per-layer weight all-gather) and
        # removes the partitioner's involuntary-full-remat reshards of the
        # shared context/x tensors in the backward.
        act = contextlib.nullcontext()
        if mesh is not None and dict(mesh.shape).get("sp", 1) == 1:
            from ezaudio_tpu.parallel.mesh import activation_sharding

            act = activation_sharding(mesh)
        with quant_context("off"), act:
            return _step(state, batch, rng)

    return step


@dataclasses.dataclass
class Trainer:
    """Host-side orchestration: mesh placement, checkpointing, logging.

    Minimal by design — the heavy lifting is the jitted step; data loading
    is the caller's iterator of batches (see ezaudio_tpu.data.dataset).
    """

    model: MaskDiT
    schedule: DDIMSchedule
    tx: optax.GradientTransformation
    state: TrainState
    step_fn: Callable
    mesh: Any = None

    @classmethod
    def create(cls, model, schedule, params, opt_cfg: dict, mesh=None,
               scale=1.0, shift=0.0, train_frames=None, cfg_dropout=0.1):
        from ezaudio_tpu.training.optim import make_optimizer

        tx = make_optimizer(
            params,
            learning_rate=opt_cfg.get("learning_rate", 5e-5),
            beta1=opt_cfg.get("beta1", 0.9),
            beta2=opt_cfg.get("beta2", 0.999),
            weight_decay=opt_cfg.get("weight_decay", 0.01),
            adam_epsilon=opt_cfg.get("adam_epsilon", 1e-8),
            warmup=opt_cfg.get("warmup", 5000),
            grad_clip=opt_cfg.get("grad_clip", 1.0),
            accumulation_steps=opt_cfg.get("accumulation_steps", 1),
            optimizer=opt_cfg.get("optimizer", "adamw"),
            mu_dtype=opt_cfg.get("mu_dtype"),
            factor_min_dim=opt_cfg.get("factor_min_dim", 128),
        )
        if mesh is not None:
            # shard params BEFORE building the optimizer state: optax init
            # uses zeros_like, so the optimizer state inherits the same
            # NamedShardings (ZeRO-style over fsdp)
            # DiT-aware rules, not the generic largest-axis fsdp rule: the
            # time-conditioning / adaln params must stay replicated or the
            # SPMD partitioner involuntarily rematerializes their grads
            # every step (see _tp_spec_for_path)
            from ezaudio_tpu.parallel.mesh import dit_param_shardings

            # NB: device_put may alias (not copy) buffers it doesn't move,
            # and the train step donates its state — callers must not
            # reuse the `params` tree they passed in after this
            params = jax.tree.map(jax.device_put, params,
                                  dit_param_shardings(mesh, params))
        state = TrainState.create(params, tx)
        step_fn = make_train_step(
            model, schedule, tx, scale=scale, shift=shift,
            snr_gamma=opt_cfg.get("snr_gamma"), cfg_dropout=cfg_dropout,
            train_frames=train_frames, mesh=mesh)
        return cls(model=model, schedule=schedule, tx=tx, state=state,
                   step_fn=step_fn, mesh=mesh)

    def train_step(self, batch, rng):
        if self.mesh is not None:
            from ezaudio_tpu.parallel.mesh import shard_batch

            batch = shard_batch(self.mesh, batch)
        self.state, metrics = self.step_fn(self.state, batch, rng)
        return metrics

    # ------------------------------------------------------------------
    def _manager(self, ckpt_dir: str):
        """Persistent async CheckpointManager per directory: periodic saves
        overlap training (orbax writes in a background thread) instead of
        stalling the step loop like the reference's torch.save
        (src/train.py:250)."""
        import orbax.checkpoint as ocp

        if getattr(self, "_mngr_dir", None) != ckpt_dir:
            self.close()
            self._mngr = ocp.CheckpointManager(
                ckpt_dir,
                options=ocp.CheckpointManagerOptions(
                    enable_async_checkpointing=True, max_to_keep=5))
            self._mngr_dir = ckpt_dir
        return self._mngr

    def close(self):
        """Flush and close any in-flight async checkpoint writer."""
        mngr = getattr(self, "_mngr", None)
        if mngr is not None:
            mngr.wait_until_finished()
            mngr.close()
            self._mngr = None
            self._mngr_dir = None

    def save_checkpoint(self, ckpt_dir: str, step: Optional[int] = None,
                        block: bool = True, skip_existing: bool = False):
        """Save params+optimizer+step.  ``block=False`` returns as soon as
        the on-device arrays are snapshotted; the write completes in the
        background (call ``close()`` or save again to join).
        ``skip_existing`` joins (when ``block``) instead of raising orbax's
        StepAlreadyExistsError when this step was already saved."""
        step = int(step if step is not None else self.state.step)
        mngr = self._manager(ckpt_dir)
        if skip_existing and step in mngr.all_steps():
            if block:
                mngr.wait_until_finished()
            return
        mngr.save(step, args=_standard_save(
            {"params": self.state.params, "opt_state": self.state.opt_state,
             "step": self.state.step}))
        if block:
            mngr.wait_until_finished()

    def restore_checkpoint(self, ckpt_dir: str, step: Optional[int] = None):
        mngr = self._manager(ckpt_dir)
        mngr.wait_until_finished()  # join any in-flight async save first
        step = step if step is not None else mngr.latest_step()
        target = {"params": self.state.params,
                  "opt_state": self.state.opt_state,
                  "step": self.state.step}
        restored = mngr.restore(step, args=_standard_restore(target))
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"])
        return self


def _standard_save(tree):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(tree)


def _standard_restore(target):
    import orbax.checkpoint as ocp

    return ocp.args.StandardRestore(target)


class PreemptionGuard:
    """Graceful-preemption handler: convert SIGTERM/SIGINT (the TPU-VM
    preemption notice) into a flag the training loop checks at the next
    step boundary, so the run checkpoints and exits cleanly instead of
    dying mid-write.  Paired with the CLI's auto-resume-from-latest, this
    gives preempt -> save -> restart -> resume with no lost optimizer
    state.  (The reference has no preemption story — accelerate DDP simply
    dies; audiotools/ml/accelerator.py.)

    Usage::

        with PreemptionGuard() as guard:
            for batch in data:
                train_step(batch)
                if guard.preempted:
                    trainer.save_checkpoint(dir, step)
                    break

    A second signal while handling the first falls back to the original
    handler (a stuck loop can still be killed).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = tuple(signals) if signals else (
            _signal.SIGTERM, _signal.SIGINT)
        self.preempted = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.preempted = True
        # restore original handlers: a repeat signal kills as usual
        for sig, prev in self._prev.items():
            self._signal.signal(sig, prev)

    def __enter__(self):
        for sig in self.signals:
            self._prev[sig] = self._signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            if self._signal.getsignal(sig) == self._handler:
                self._signal.signal(sig, prev)
        self._prev.clear()
        return False
