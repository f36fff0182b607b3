"""Progressive distillation (diffusion/distill.py).

Pins the math and the training plumbing:
  * the closed-form v-target is exact — one student DDIM step with v*
    lands bit-close on the two-teacher-step endpoint;
  * grid alignment: the student's step span equals the teacher's two-step
    span by construction (shared alpha endpoints);
  * a distillation stage on a tiny model reduces the loss;
  * the distilled sampler (no CFG pair) runs on the halved grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.diffusion.distill import (
    DistillTables, distill_tables, distilled_sample, make_distill_step,
    teacher_two_step_target, v_target_from_endpoint)
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.training.optim import make_optimizer
from ezaudio_tpu.training.trainer import TrainState

DIFF = dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
            beta_start=0.00085, beta_end=0.012,
            prediction_type="v_prediction", rescale_betas_zero_snr=True,
            timestep_spacing="trailing", clip_sample=False)

MODEL = dict(
    mae=False, mae_prob=0.0, mask_ratio=[0.25, 1.0], mask_span=4,
    img_size=16, patch_size=1, in_chans=4, out_chans=4, input_type="1d",
    embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
    qkv_bias=False, qk_scale=None, qk_norm="layernorm",
    norm_layer="layernorm", act_layer="geglu", context_norm=True,
    use_checkpoint=False, time_fusion="ada_sola_bias",
    ada_sola_rank=4, ada_sola_alpha=4, cls_dim=None,
    context_dim=8, context_fusion="cross", context_max_length=None,
    context_pe_method="none", pe_method="none", rope_mode="shared",
    use_conv=True, skip=True, skip_norm=True,
)


@pytest.fixture(scope="module")
def setup():
    schedule = DDIMSchedule.from_config(DIFF)
    model = maskdit_from_config(MODEL)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key},
                        jnp.zeros((1, 16, 4)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, 8)))["params"]
    # make time conditioning live (AdaLN heads are zero-init)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))

    def teacher_fn(x, t):
        t = jnp.broadcast_to(t, (x.shape[0],))
        out, _ = model.apply({"params": params}, x, t, ctx)
        return out

    return schedule, model, params, ctx, teacher_fn


class TestTables:
    def test_alignment_with_teacher_grid(self):
        schedule = DDIMSchedule.from_config(DIFF)
        t8 = distill_tables(schedule, 8)
        a_t2, a_prev2, ts2 = schedule.step_tables(16)
        np.testing.assert_array_equal(np.asarray(t8.ts), ts2[0::2])
        np.testing.assert_array_equal(np.asarray(t8.a_mid), a_t2[1::2])
        np.testing.assert_array_equal(np.asarray(t8.a_prev), a_prev2[1::2])
        assert t8.num_steps == 8
        # zero-terminal-SNR start: the first student point is abar = 0
        assert float(t8.a_t[0]) == 0.0

    def test_student_grid_ends_at_data(self):
        schedule = DDIMSchedule.from_config(DIFF)
        t4 = distill_tables(schedule, 4)
        assert float(t4.a_prev[-1]) == pytest.approx(
            float(schedule.final_alpha_cumprod))


@pytest.mark.heavy  # 36 s: per-step closed-form sweep over a compiled teacher
class TestClosedForm:
    def test_v_target_reproduces_two_teacher_steps(self, setup):
        """One student DDIM step with the closed-form v* must land exactly
        on the two-teacher-step endpoint — for every student step index."""
        schedule, model, params, ctx, teacher_fn = setup
        tables = distill_tables(schedule, 4)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 4))
        for m_val in range(4):
            m = jnp.full((2,), m_val, jnp.int32)
            x_tgt = teacher_two_step_target(teacher_fn, schedule, x, m, tables)
            shape = (2, 1, 1)
            a = tables.a_t[m].reshape(shape)
            a_prev = tables.a_prev[m].reshape(shape)
            v_star = v_target_from_endpoint(x, x_tgt, a, a_prev)
            x_hat = schedule.ddim_step(v_star, x, a, a_prev, eta=0.0)
            np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x_tgt),
                                       atol=1e-5, rtol=1e-5)

    def test_scalar_m_supported(self, setup):
        schedule, model, params, ctx, teacher_fn = setup
        tables = distill_tables(schedule, 4)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 4))
        out = teacher_two_step_target(teacher_fn, schedule, x,
                                      jnp.int32(1), tables)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


class TestDistillStage:
    def test_loss_decreases(self, setup):
        schedule, model, params, ctx, teacher_fn = setup
        tables = distill_tables(schedule, 4)

        def student_apply(p, x, t, batch):
            t = jnp.broadcast_to(t, (x.shape[0],))
            out, _ = model.apply({"params": p}, x, t, batch["text"])
            return out

        def teacher_fn_builder(batch):
            def fn(x, t):
                t = jnp.broadcast_to(t, (x.shape[0],))
                out, _ = model.apply({"params": params}, x, t, batch["text"])
                return out
            return fn

        tx = make_optimizer(params, learning_rate=1e-3, warmup=0)
        # student starts FROM the teacher (standard progressive init); the
        # step donates state, so copy — donating the module-scoped fixture
        # tree would delete it for the remaining tests
        state = TrainState.create(jax.tree.map(jnp.array, params), tx)
        step = make_distill_step(student_apply, teacher_fn_builder,
                                 schedule, tx, tables)

        rng = np.random.default_rng(0)
        losses = []
        for i in range(30):
            batch = {
                "latents": jnp.asarray(
                    rng.standard_normal((4, 16, 4)) * 0.5, jnp.float32),
                "text": jnp.asarray(
                    rng.standard_normal((4, 3, 8)), jnp.float32),
            }
            state, metrics = step(state, batch, jax.random.PRNGKey(5))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    def test_distilled_sample_runs(self, setup):
        schedule, model, params, ctx, teacher_fn = setup
        tables = distill_tables(schedule, 4)
        noise = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 4))
        out = jax.jit(lambda n: distilled_sample(
            teacher_fn, schedule, n, tables))(noise)
        assert out.shape == noise.shape
        assert np.isfinite(np.asarray(out)).all()
