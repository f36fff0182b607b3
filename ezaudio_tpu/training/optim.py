"""Optimizer setup: AdamW with the reference's weight-decay split.

Parity target: ``setup_optimizer`` (reference src/train.py:72-106) — decay
applies only to Linear/Conv weights; biases, norm weights, abs_pe,
snake alpha/beta, mask_embed, scale_shift_table and cfg_embedding get no
decay.  In our param trees every Linear/Conv weight is a leaf named
``kernel`` and everything else is not, so the split is exactly
"decay iff leaf name == 'kernel'".

LR schedule parity: ``get_lr_scheduler(..., 'customized')``
(src/utils/utils.py:40-50) = linear warmup then constant;  cosine also
provided (CosineAnnealingLR equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def decay_mask(params) -> dict:
    """True (apply weight decay) for Linear/Conv kernels only."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_kernel(path) -> bool:
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", str(last)))
        return name == "kernel"

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [is_kernel(p) for p, _ in flat],
    )


def warmup_lr_schedule(base_lr: float, warmup_steps: int):
    """min(step / warmup, 1) * lr — the reference's 'customized' schedule."""
    def fn(step):
        if warmup_steps <= 0:
            return base_lr
        import jax.numpy as jnp

        return base_lr * jnp.minimum(step / warmup_steps, 1.0)

    return fn


def cosine_lr_schedule(base_lr: float, decay_steps: int, eta_min: float = 0.0):
    return optax.cosine_decay_schedule(base_lr, decay_steps, alpha=eta_min / max(base_lr, 1e-12))


def make_optimizer(
    params,
    learning_rate: float = 5e-5,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.01,
    adam_epsilon: float = 1e-8,
    warmup: int = 5000,
    grad_clip: Optional[float] = 1.0,
    accumulation_steps: int = 1,
    schedule: str = "customized",
    total_steps: int = 1_000_000,
    optimizer: str = "adamw",
    mu_dtype: Optional[str] = None,
    factor_min_dim: int = 128,
) -> optax.GradientTransformation:
    """AdamW mirroring the reference opt_config.yml defaults.

    HBM-bandwidth levers (probe12 profile: the f32 AdamW update streams
    ~24.5 GB/step at XL — 15-17% of the device step), both opt-in because
    they change optimizer numerics:

    * ``mu_dtype='bfloat16'`` keeps the first moment in bf16 (optax
      casts it per-update), cutting ~2/7 of the optimizer traffic at
      negligible quality risk (the variance stays f32).
    * ``optimizer='adafactor'`` replaces the per-param second moment
      with a factored row/col estimate — ~4 GB less state at XL and the
      classic memory-bound-training choice.  Wired Adam-like: explicit
      LR schedule, no parameter-scale multiplier, momentum=beta1 so it
      remains a drop-in for the trainer's resume/sharding paths.
    """
    if schedule == "customized":
        lr = warmup_lr_schedule(learning_rate, warmup)
    elif schedule == "cosine":
        lr = cosine_lr_schedule(learning_rate, total_steps)
    else:
        raise NotImplementedError(schedule)

    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if optimizer == "adamw":
        chain.append(
            optax.adamw(
                learning_rate=lr, b1=beta1, b2=beta2, eps=adam_epsilon,
                weight_decay=weight_decay, mask=decay_mask(params),
                mu_dtype=mu_dtype,
            )
        )
    elif optimizer == "adafactor":
        import jax.numpy as jnp

        chain.append(
            optax.adafactor(
                learning_rate=lr,
                min_dim_size_to_factor=factor_min_dim,
                multiply_by_parameter_scale=False,
                momentum=beta1 if beta1 else None,
                dtype_momentum=jnp.dtype(mu_dtype) if mu_dtype
                else jnp.float32,
                # NB: adafactor's decay_rate is the paper's step-dependent
                # second-moment exponent (beta2_t = 1 - step^-d), NOT
                # Adam's beta2 — keep the paper default 0.8.  Its eps is
                # the second-moment floor (paper default 1e-30), NOT
                # Adam's epsilon — keep the optax default too.
                #
                # optax applies weight_decay_rate AFTER the lr scaling
                # (a raw per-step shrink), so the AdamW-equivalent
                # decoupled decay is lr*wd, approximated here with the
                # BASE lr (during warmup the relative decay is slightly
                # stronger than AdamW's; at full lr they match).
                weight_decay_rate=(learning_rate * weight_decay
                                   if weight_decay else None),
                weight_decay_mask=decay_mask(params),
            )
        )
    else:
        raise NotImplementedError(optimizer)
    tx = optax.chain(*chain)
    if accumulation_steps > 1:
        # clip + update fire on accumulation boundaries only, matching
        # accelerate's sync_gradients gating (src/train.py:304-307).
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
