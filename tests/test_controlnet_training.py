"""ControlNet training: frozen base, trainable subset, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.controlnet import controlnet_from_config, trainable_mask
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.training.controlnet_trainer import make_controlnet_train_step
from tests.test_dit import TINY_MODEL
from tests.test_controlnet import TINY_CN
from tests.tiny_config import TINY_CONFIG


def test_controlnet_training_step(rng):
    key = jax.random.PRNGKey(0)
    dit = maskdit_from_config(TINY_MODEL)
    cn = controlnet_from_config(TINY_MODEL, TINY_CN)
    schedule = DDIMSchedule.from_config(TINY_CONFIG["diff"])

    B, L, C, Lc, D = 2, 32, 8, 5, 24
    x = jnp.zeros((B, L, C))
    ctx = jnp.zeros((B, Lc, D))
    dit_params = dit.init({"params": key, "mask": key},
                          x, jnp.zeros((B,), jnp.int32), ctx)["params"]
    cond = jnp.zeros((B, 2 * L, 1))
    cn_params = cn.init({"params": key, "mask": key},
                        jnp.zeros((B, L, 17)), jnp.zeros((B,), jnp.int32),
                        ctx, condition=cond)["params"]

    init, step = make_controlnet_train_step(
        dit, cn, schedule, dit_params, learning_rate=2e-3, warmup=0)
    state = init(cn_params)

    batch = {
        "latents": jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32)),
        "condition": jnp.asarray(rng.standard_normal((B, 2 * L, 1)).astype(np.float32)),
        "text": jnp.asarray(rng.standard_normal((B, Lc, D)).astype(np.float32)),
        "text_mask": jnp.ones((B, Lc), bool),
    }
    # determinism: same state+rng -> identical loss.  The step DONATES its
    # state, so each probe gets a fresh init (init() deep-copies cn_params,
    # which therefore survives for the frozen-subset comparison below).
    _, m1 = step(init(cn_params), batch, jax.random.PRNGKey(1))
    _, m2 = step(init(cn_params), batch, jax.random.PRNGKey(1))
    assert float(m1["loss"]) == float(m2["loss"])

    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert all(float(g) > 0 for g in [m["grad_norm"]])

    # frozen subsets did not move
    mask = trainable_mask(cn_params)
    for name in cn_params:
        moved = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            cn_params[name], state.cn_params[name])))
        is_trainable = all(jax.tree.leaves(mask[name]))
        if is_trainable:
            assert moved > 0, f"{name} should have trained"
        else:
            assert moved == 0, f"{name} should be frozen"
