"""Training step + multi-device DP tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.training.optim import decay_mask, make_optimizer
from ezaudio_tpu.training.trainer import TrainState, make_train_step
from tests.test_dit import TINY_MODEL
from tests.tiny_config import TINY_CONFIG


def _fresh(params):
    """Deep-copy a param tree: train steps DONATE their input state (the
    production memory posture), so each test must hand the step its own copy
    instead of the module-scoped fixture's buffers."""
    return jax.tree.map(jnp.copy, params)


@pytest.fixture(scope="module")
def setup():
    model = maskdit_from_config(TINY_MODEL)
    key = jax.random.PRNGKey(0)
    B, L, C = 8, 32, 8
    x = jnp.zeros((B, L, C))
    ctx = jnp.zeros((B, 5, 24))
    variables = model.init({"params": key, "mask": key}, x, jnp.zeros((B,), jnp.int32), ctx)
    params = variables["params"]
    schedule = DDIMSchedule.from_config(TINY_CONFIG["diff"])
    return model, params, schedule


def make_batch(rng, B=8, L=32, C=8, Lc=5, D=24):
    return {
        "latents": jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32)),
        "text": jnp.asarray(rng.standard_normal((B, Lc, D)).astype(np.float32)),
        "text_mask": jnp.ones((B, Lc), bool),
        "uncond": jnp.asarray(rng.standard_normal((1, Lc, D)).astype(np.float32)),
        "uncond_mask": jnp.ones((1, Lc), bool),
    }


class TestDecayMask:
    def test_kernels_decay_everything_else_not(self, setup):
        _, params, _ = setup
        mask = decay_mask(params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, v in flat:
            name = path[-1].key
            assert v == (name == "kernel"), path
        # sanity: both classes exist
        vals = [v for _, v in flat]
        assert any(vals) and not all(vals)


class TestTrainStep:
    def test_loss_decreases_single_device(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=2e-3, warmup=0, grad_clip=1.0)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            state, m = step(state, batch, key)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_warmup_lr_gates_first_steps(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=1.0, warmup=10_000)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        p0 = jax.device_get(state.params)  # snapshot: the step donates state
        state2, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
        # lr ~ 1/10000 of 1.0 -> param delta tiny
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, state2.params)
        assert max(jax.tree.leaves(d)) < 1e-3

    def test_accumulation_steps(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=1e-3, warmup=0,
                            accumulation_steps=2)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        p0 = jax.device_get(state.params)  # snapshot: the step donates state
        s1, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
        # first micro-step: no update applied yet
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, s1.params)
        assert max(jax.tree.leaves(d)) == 0.0
        s2, _ = step(s1, make_batch(rng), jax.random.PRNGKey(1))
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, s2.params)
        assert max(jax.tree.leaves(d)) > 0.0


class TestDataParallel:
    def test_dp_step_matches_single_device(self, setup, rng):
        """The sharded step must produce the same loss/update as unsharded —
        XLA's inserted psum is the DDP all-reduce."""
        from ezaudio_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        model, params, schedule = setup
        assert len(jax.devices()) == 8
        mesh = make_mesh(dp=8)
        tx = make_optimizer(params, learning_rate=1e-3, warmup=0)
        step = make_train_step(model, schedule, tx)

        batch = make_batch(rng)
        key = jax.random.PRNGKey(0)

        state = TrainState.create(_fresh(params), tx)
        s_ref, m_ref = step(state, batch, key)

        state_sh = TrainState.create(replicate(mesh, params), tx)
        batch_sh = shard_batch(mesh, batch)
        s_dp, m_dp = step(state_sh, batch_sh, key)

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s_ref.params, jax.device_get(s_dp.params))
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_fsdp_sharding_specs(self, setup):
        from ezaudio_tpu.parallel.mesh import make_mesh, param_shardings

        model, params, _ = setup
        mesh = make_mesh(dp=2, fsdp=4)
        sh = param_shardings(mesh, params)
        specs = [s.spec for s in jax.tree.leaves(sh)]
        # at least the big kernels get sharded over fsdp
        assert any("fsdp" in str(s) for s in specs)
