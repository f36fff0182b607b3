"""Fault tolerance: preemption signals, async checkpointing, resume.

The reference has no preemption story (accelerate DDP dies on SIGTERM and
`torch.save` blocks the step loop — src/train.py:250).  Here:
  * PreemptionGuard converts SIGTERM/SIGINT into a step-boundary flag;
  * saves are async (orbax background write) so checkpointing overlaps
    training;
  * restore-from-latest gives preempt -> restart -> resume with identical
    params + optimizer state + step.
"""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.training.trainer import PreemptionGuard, Trainer

MODEL = dict(
    mae=True, mae_prob=0.25, mask_ratio=[0.25, 1.0], mask_span=4,
    img_size=16, patch_size=1, in_chans=9, out_chans=4, input_type="1d",
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    qkv_bias=False, qk_scale=None, qk_norm="layernorm",
    norm_layer="layernorm", act_layer="geglu", context_norm=True,
    use_checkpoint=False, time_fusion="ada_sola_bias",
    ada_sola_rank=4, ada_sola_alpha=4, cls_dim=None,
    context_dim=8, context_fusion="cross", context_max_length=None,
    context_pe_method="none", pe_method="none", rope_mode="shared",
    use_conv=True, skip=True, skip_norm=True,
)
DIFF = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
            beta_start=0.00085, beta_end=0.012,
            prediction_type="v_prediction", rescale_betas_zero_snr=True,
            timestep_spacing="trailing", clip_sample=False)
OPT = dict(learning_rate=1e-4, warmup=0, accumulation_steps=1)


def _make_trainer():
    model = maskdit_from_config(MODEL)
    schedule = DDIMSchedule.from_config(DIFF)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "mask": key},
        jnp.zeros((1, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, 8)))["params"]
    return Trainer.create(model, schedule, params, OPT)


def _batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "latents": jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32),
        "text": jnp.asarray(rng.standard_normal((2, 3, 8)), jnp.float32),
        "text_mask": jnp.ones((2, 3), bool),
        "uncond": jnp.asarray(rng.standard_normal((1, 3, 8)), jnp.float32),
        "uncond_mask": jnp.ones((1, 3), bool),
    }


class TestPreemptionGuard:
    def test_sigterm_sets_flag_not_kill(self):
        with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
            assert not guard.preempted
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.preempted  # converted to a flag, process alive

    def test_handlers_restored_on_exit(self):
        prev = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard(signals=(signal.SIGTERM,)):
            assert signal.getsignal(signal.SIGTERM) != prev
        assert signal.getsignal(signal.SIGTERM) == prev

    def test_second_signal_uses_original_handler(self):
        calls = []
        prev = signal.signal(signal.SIGTERM, lambda *a: calls.append(1))
        try:
            with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
                os.kill(os.getpid(), signal.SIGTERM)
                assert guard.preempted and not calls
                os.kill(os.getpid(), signal.SIGTERM)  # falls through
                assert calls == [1]
        finally:
            signal.signal(signal.SIGTERM, prev)


class TestPreemptResume:
    def test_preempt_save_resume_identical(self, tmp_path):
        """The full cycle: train, get preempted mid-run, checkpoint, build
        a FRESH trainer, auto-resume from latest — params, optimizer state
        and step all match; training continues."""
        ckpt = str(tmp_path / "ckpts")
        trainer = _make_trainer()
        rng = jax.random.PRNGKey(1)

        with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
            for step in range(10):
                trainer.train_step(_batch(step), jax.random.fold_in(rng, step))
                if step == 2:
                    os.kill(os.getpid(), signal.SIGTERM)  # preemption notice
                if guard.preempted:
                    trainer.save_checkpoint(ckpt, block=True)
                    break
        assert guard.preempted and int(trainer.state.step) == 3
        trainer.close()

        fresh = _make_trainer()
        fresh.restore_checkpoint(ckpt)  # latest
        assert int(fresh.state.step) == 3
        for a, b in zip(jax.tree.leaves(fresh.state.params),
                        jax.tree.leaves(trainer.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(fresh.state.opt_state),
                        jax.tree.leaves(trainer.state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed training proceeds
        m = fresh.train_step(_batch(3), jax.random.fold_in(rng, 3))
        assert np.isfinite(float(m["loss"]))
        fresh.close()

    def test_async_save_overlaps_and_restores(self, tmp_path):
        """block=False returns before the write completes; a later restore
        joins the writer and sees the exact state."""
        ckpt = str(tmp_path / "ckpts")
        trainer = _make_trainer()
        rng = jax.random.PRNGKey(2)
        trainer.train_step(_batch(0), rng)
        trainer.save_checkpoint(ckpt, block=False)
        # keep training while the write is in flight
        trainer.train_step(_batch(1), jax.random.fold_in(rng, 1))
        assert int(trainer.state.step) == 2
        # restore joins the in-flight writer (same manager), rolls back to
        # the snapshot taken at save time
        trainer.restore_checkpoint(ckpt)
        assert int(trainer.state.step) == 1
        trainer.close()

    def test_max_to_keep_prunes(self, tmp_path):
        ckpt = str(tmp_path / "ckpts")
        trainer = _make_trainer()
        rng = jax.random.PRNGKey(3)
        for step in range(7):
            trainer.train_step(_batch(step), jax.random.fold_in(rng, step))
            trainer.save_checkpoint(ckpt, block=False)
        trainer.close()
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(ckpt) as m:
            steps = list(m.all_steps())
        assert len(steps) <= 5 and max(steps) == 7
