"""Rectified-flow schedule/sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.flow import FlowSchedule, flow_matching_loss, flow_sample


class TestFlowSchedule:
    def test_grid(self):
        s = FlowSchedule()
        t = s.timesteps(10)
        assert t[0] == 1.0 and t[-1] == 0.0 and len(t) == 11
        assert (np.diff(t) < 0).all()

    def test_shifted_grid_monotone(self):
        t = FlowSchedule(shift=3.0).timesteps(8)
        assert t[0] == 1.0 and abs(t[-1]) < 1e-7
        assert (np.diff(t) < 0).all()

    def test_interpolation_endpoints(self, rng):
        s = FlowSchedule()
        x0 = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
        eps = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
        at0 = s.interpolate(x0, eps, jnp.zeros(2))
        at1 = s.interpolate(x0, eps, jnp.ones(2))
        np.testing.assert_allclose(np.asarray(at0), np.asarray(x0))
        np.testing.assert_allclose(np.asarray(at1), np.asarray(eps))


class TestFlowSampler:
    def test_exact_for_constant_velocity(self, rng):
        """If the model returns the TRUE constant velocity eps - x0, ANY
        number of Euler steps recovers x0 exactly from noise."""
        s = FlowSchedule()
        x0 = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
        eps = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
        v_true = s.velocity_target(x0, eps)

        out = flow_sample(lambda x, t: v_true, s, eps, num_steps=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)
        out8 = flow_sample(lambda x, t: v_true, s, eps, num_steps=8)
        np.testing.assert_allclose(np.asarray(out8), np.asarray(x0), atol=1e-5)

    def test_heun_beats_euler_on_curved_field(self, rng):
        """For v(x,t) = -x (curved trajectories), Heun at N steps must beat
        Euler at N steps against the analytic solution x(0) = x(1) * e."""
        s = FlowSchedule()
        x1 = jnp.asarray(rng.standard_normal((1, 4, 2)).astype(np.float32))
        exact = np.asarray(x1) * np.e

        def v(x, t):
            return -x

        eul = np.asarray(flow_sample(v, s, x1, num_steps=6, method="euler"))
        heu = np.asarray(flow_sample(v, s, x1, num_steps=6, method="heun"))
        assert np.abs(heu - exact).max() < np.abs(eul - exact).max()

    def test_cfg_pair(self, rng):
        s = FlowSchedule()
        eps = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))

        def fn(x, t):
            B = x.shape[0] // 2
            return jnp.concatenate([-0.5 * x[:B], -0.25 * x[B:]], axis=0)

        out = flow_sample(fn, s, eps, num_steps=4, guidance_scale=2.0)
        assert np.isfinite(np.asarray(out)).all()


class TestFlowMatchingTraining:
    @pytest.mark.heavy  # 15 s training loop; flow math covered by the schedule/sampler tests
    def test_loss_decreases_on_maskdit(self, rng):
        import optax

        from ezaudio_tpu.models.maskdit import maskdit_from_config
        from tests.test_dit import TINY_MODEL

        model = maskdit_from_config(TINY_MODEL)
        key = jax.random.PRNGKey(0)
        B, L, C, Lc, D = 4, 32, 8, 5, 24
        x0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
        ctx = jnp.asarray(rng.standard_normal((B, Lc, D)).astype(np.float32))
        params = model.init({"params": key, "mask": key},
                            x0, jnp.zeros((B,), jnp.int32), ctx)

        tx = optax.adam(2e-3)
        opt_state = tx.init(params)

        def apply_fn(p, xt, t_scaled, rngs=None):
            return model.apply(p, xt, t_scaled, ctx, gt=x0, train=True,
                               rngs=rngs)

        @jax.jit
        def step(p, o, k):
            k1, k2, k3 = jax.random.split(k, 3)
            noise = jax.random.normal(k1, x0.shape)
            t = jax.random.uniform(k2, (B,))
            loss, g = jax.value_and_grad(
                lambda pp: flow_matching_loss(apply_fn, pp, x0, noise, t,
                                              rngs={"mask": k3}))(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        losses = []
        k = jax.random.PRNGKey(5)
        for i in range(10):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(100))  # fixed batch noise
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
