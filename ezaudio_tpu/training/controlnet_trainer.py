"""ControlNet training: frozen base MaskDiT + trainable ControlNet subset.

The reference trains the ControlNet by cloning the base UDiT's in-blocks
and freezing everything except ``controlnet_pre`` / ``in_blocks`` /
``controlnet_zero_blocks`` (controlnet.py:238-250 set_trainable).  Here the
freeze is an ``optax.masked`` optimizer over the ControlNet param tree
(``trainable_mask``), and the diffusion objective matches the base recipe:
noise + v-target on condition-extracted batches, masked MSE.

The per-step forward is the inference three-phase call with the training
condition pipeline (condition span-masking active inside ControlNetEmbed).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.controlnet import DiTControlNet, trainable_mask
from ezaudio_tpu.models.maskdit import MaskDiT
from ezaudio_tpu.training.losses import masked_diffusion_loss
from ezaudio_tpu.training.optim import warmup_lr_schedule
from ezaudio_tpu.utils import scale_shift


class ControlNetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    cn_params: dict
    opt_state: optax.OptState


def make_controlnet_train_step(
    dit: MaskDiT,
    cn: DiTControlNet,
    schedule: DDIMSchedule,
    dit_params: dict,
    learning_rate: float = 5e-5,
    warmup: int = 5000,
    grad_clip: float = 1.0,
    scale: float = 1.0,
    shift: float = 0.0,
    snr_gamma: Optional[float] = None,
    conditioning_scale: float = 1.0,
):
    """Returns (init_fn(cn_params) -> state, step_fn(state, batch, rng)).

    batch: latents (B, L, C); condition (B, Lcond, cond_in);
           text (B, Lc, D) + text_mask (base stage text conditioning).
    """

    def make_tx(cn_params):
        mask = trainable_mask(cn_params)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(warmup_lr_schedule(learning_rate, warmup)),
        )
        # frozen leaves get zero updates (optax.masked would pass raw
        # gradients through for unmasked leaves)
        return optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)

    def init(cn_params) -> ControlNetTrainState:
        # Deep-copy: the step DONATES its state, and cn_params commonly
        # aliases the frozen base tree (init_params_from_base shares the
        # in_block leaf buffers) — donating an aliased tree would delete
        # the base params out from under the frozen forward pass.
        cn_params = jax.tree.map(jnp.array, cn_params)
        return ControlNetTrainState(
            step=jnp.zeros((), jnp.int32), cn_params=cn_params,
            opt_state=make_tx(cn_params).init(cn_params))

    def loss_fn(cn_params, dit_params, batch, rng):
        k_noise, k_t, k_mask = jax.random.split(rng, 3)
        latents = scale_shift(batch["latents"], scale, shift)
        B = latents.shape[0]
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, t)
        if schedule.prediction_type == "v_prediction":
            target = schedule.get_velocity(latents, noise, t)
        else:
            target = noise

        # base MAE concat with full gt (base frozen; mae_mask is all-ones
        # for the t2a stage, matching ControlNet inference)
        concat, mae_mask = dit.apply(
            {"params": dit_params}, noisy, t, batch.get("text"),
            context_mask=batch.get("text_mask"), forward_model=False)
        skips = cn.apply(
            {"params": cn_params}, concat, t, batch.get("text"),
            context_mask=batch.get("text_mask"), condition=batch["condition"],
            conditioning_scale=conditioning_scale, train=True,
            rngs={"mask": k_mask})
        pred = dit.apply(
            {"params": dit_params}, concat, t, batch.get("text"),
            x_mask=None, context_mask=batch.get("text_mask"), cls_token=None,
            controlnet_skips=skips, method=MaskDiT.forward_backbone)
        return masked_diffusion_loss(pred, target, mae_mask, schedule, t,
                                     snr_gamma)

    # The frozen base tree is a runtime ARGUMENT of the jitted step, not a
    # closure capture: captured trees bake into the HLO as constants, and at
    # mid/flagship geometry the serialized program blows past the axon
    # tunnel's remote_compile body limit (observed HTTP 413 at 83M params).
    # state is donated: without aliasing, an async dispatch queue running
    # ahead of a slow device pins one full state copy per enqueued step in
    # host staging (the r4 distill-serve OOM lesson, diffusion/distill.py).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: ControlNetTrainState, dit_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.cn_params, dit_params, batch, rng)
        tx = make_tx(state.cn_params)
        updates, opt_state = tx.update(grads, state.opt_state, state.cn_params)
        cn_params = optax.apply_updates(state.cn_params, updates)
        return (state.replace(step=state.step + 1, cn_params=cn_params,
                              opt_state=opt_state),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    dit_params = jax.device_put(dit_params)

    def step(state: ControlNetTrainState, batch, rng):
        return _step(state, dit_params, batch, rng)

    return init, step
