"""Progressive distillation: halve the sampler's step count by training.

Salimans & Ho (arXiv 2202.00512) adapted to the EzAudio schedule
(v-prediction, zero-terminal-SNR, trailing spacing): a student initialized
from the teacher learns to cover TWO teacher DDIM steps with ONE of its
own.  Repeating the stage halves the step count each time (16 -> 8 -> 4),
the training-based counterpart of the training-free DPM/layer-cache
accelerations (FlashAudio/MeanAudio direction from the retrieved papers).

Two TPU-friendly properties drive this implementation:

  * the v-target is CLOSED FORM — one eta=0 DDIM step is affine in the
    model output, ``x' = A x + B v`` with
    ``A = sqrt(a' a) + sqrt((1-a')(1-a))``,
    ``B = sqrt((1-a') a) - sqrt(a' (1-a))``,
    so the student regresses ``v* = (x_target - A x) / B`` directly (no
    implicit solve, no gradient through the teacher);
  * CFG is distilled INTO the student (the teacher closure applies
    guidance; the student is called on the single batch) — the distilled
    sampler needs no CFG pair, halving inference cost again.

Grid bookkeeping: the teacher runs on ``step_tables(2N)``; the student's
step m spans teacher points ``2m -> 2m+2`` using the teacher's OWN alpha
values at both ends, so rounding in the timestep grid can never make the
chained teacher path and the student path disagree about endpoints.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.diffusion.ddim import DDIMSchedule


class DistillTables(NamedTuple):
    """Aligned student/teacher DDIM tables for one halving stage.

    Student step m: ``a_t[m] -> a_prev[m]`` at timestep ``ts[m]``;
    the same span for the teacher is ``a_t[m] -> a_mid[m] -> a_prev[m]``
    with the intermediate model call at timestep ``ts_mid[m]``.
    """

    a_t: jnp.ndarray
    a_mid: jnp.ndarray
    a_prev: jnp.ndarray
    ts: jnp.ndarray
    ts_mid: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.ts.shape[0]


def distill_tables(schedule: DDIMSchedule, num_student_steps: int
                   ) -> DistillTables:
    a_t2, a_prev2, ts2 = schedule.step_tables(2 * num_student_steps)
    return DistillTables(
        a_t=jnp.asarray(a_t2[0::2]),
        a_mid=jnp.asarray(a_t2[1::2]),
        a_prev=jnp.asarray(a_prev2[1::2]),
        ts=jnp.asarray(ts2[0::2]),
        ts_mid=jnp.asarray(ts2[1::2]),
    )


def _ab(a: jnp.ndarray, a_prev: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The affine DDIM coefficients: one eta=0 v-prediction step is
    ``x' = A x + B v``."""
    A = jnp.sqrt(a_prev * a) + jnp.sqrt((1.0 - a_prev) * (1.0 - a))
    B = jnp.sqrt((1.0 - a_prev) * a) - jnp.sqrt(a_prev * (1.0 - a))
    return A, B


def teacher_two_step_target(teacher_fn: Callable, schedule: DDIMSchedule,
                            x: jnp.ndarray, m: jnp.ndarray,
                            tables: DistillTables) -> jnp.ndarray:
    """Run two teacher DDIM steps across the student's step m span.
    ``m`` may be per-sample (B,) or scalar."""
    shape = (x.shape[0],) + (1,) * (x.ndim - 1) if jnp.ndim(m) else ()
    a_t = tables.a_t[m].reshape(shape)
    a_mid = tables.a_mid[m].reshape(shape)
    a_prev = tables.a_prev[m].reshape(shape)
    v0 = teacher_fn(x, tables.ts[m])
    x_mid = schedule.ddim_step(v0, x, a_t, a_mid, eta=0.0)
    v1 = teacher_fn(x_mid, tables.ts_mid[m])
    return schedule.ddim_step(v1, x_mid, a_mid, a_prev, eta=0.0)


def v_target_from_endpoint(x: jnp.ndarray, x_target: jnp.ndarray,
                           a: jnp.ndarray, a_prev: jnp.ndarray
                           ) -> jnp.ndarray:
    """Closed-form v the student must predict so that one DDIM step from
    ``x`` (alpha-bar ``a``) lands exactly on ``x_target`` (``a_prev``)."""
    A, B = _ab(a, a_prev)
    return (x_target - A * x) / B


def make_distill_step(student_apply: Callable, teacher_fn_builder: Callable,
                      schedule: DDIMSchedule, tx,
                      tables: DistillTables,
                      teacher_params=None) -> Callable:
    """Build a jitted one-stage distillation train step.

    ``student_apply(params, x, t, batch) -> v``  (single batch, no CFG);
    ``teacher_fn_builder(batch[, teacher_params]) -> teacher_fn(x, t) ->
    v_guided``  (the teacher closure applies CFG internally — guidance is
    distilled in).

    Pass the frozen teacher tree via ``teacher_params`` (the builder then
    receives it as a second argument): it rides the jit as a real argument
    instead of being baked into the executable as HLO constants — closing
    a multi-GB tree into the jitted step would re-upload it with the
    program (the probe8 lesson; see CLAUDE.md).  The builder-closure form
    (``teacher_params=None``) remains for small teachers.

    The returned step has the same (state, batch, rng) -> (state, metrics)
    contract as ``training.trainer.make_train_step``; ``batch`` must carry
    ``latents`` (clean x0) plus whatever conditioning the two closures
    need.  Like that step, it DONATES the incoming state — since the
    student is conventionally initialized FROM the teacher, build the
    state from a COPY (``jax.tree.map(jnp.array, teacher_params)``), or
    the first donation deletes the teacher tree out from under
    ``teacher_fn``.
    """
    assert schedule.prediction_type == "v_prediction", (
        "the closed-form target below is the v-parameterization; "
        "epsilon/sample variants follow from convert_output the same way")

    def loss_fn(params, batch, rng, t_params):
        x0 = batch["latents"]
        B = x0.shape[0]
        k_m, k_eps = jax.random.split(rng)
        m = jax.random.randint(k_m, (B,), 0, tables.num_steps)
        eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
        a = tables.a_t[m].reshape((B,) + (1,) * (x0.ndim - 1))
        a_prev = tables.a_prev[m].reshape((B,) + (1,) * (x0.ndim - 1))
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * eps

        teacher_fn = (teacher_fn_builder(batch) if t_params is None
                      else teacher_fn_builder(batch, t_params))
        x_tgt = jax.lax.stop_gradient(
            teacher_two_step_target(teacher_fn, schedule, x_t, m, tables))
        v_star = v_target_from_endpoint(x_t, x_tgt, a, a_prev)

        v = student_apply(params, x_t, tables.ts[m], batch)
        return jnp.mean((v - v_star) ** 2)

    import functools

    import optax

    # Donate the incoming state: without it, an async dispatch queue that
    # runs ahead of a slow device pins one full un-aliased (params, mu, nu)
    # copy PER ENQUEUED STEP in host staging — at mid scale that is ~1 GB a
    # step and OOM-killed the r4 distill-serve run at 130 GB RSS.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state, batch, rng, t_params):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, rng, t_params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"loss": loss}

    def step(state, batch, rng):
        # int8 quant is inference-only (round has no gradient): force it off
        # at trace time even if EZAUDIO_QUANT is set in the environment.
        from ezaudio_tpu.ops.quant import quant_context

        with quant_context("off"):
            return _step(state, batch, rng, teacher_params)

    return step


def distilled_sample(student_fn: Callable, schedule: DDIMSchedule,
                     noise: jnp.ndarray, tables: DistillTables
                     ) -> jnp.ndarray:
    """Deterministic DDIM sampling on the student's halved grid.  No CFG
    pair — guidance was distilled into the student."""

    def body(x, m):
        v = student_fn(x, tables.ts[m])
        x = schedule.ddim_step(v, x, tables.a_t[m], tables.a_prev[m], eta=0.0)
        return x.astype(noise.dtype), None

    x, _ = jax.lax.scan(body, noise, jnp.arange(tables.num_steps))
    return x
