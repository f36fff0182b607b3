"""DDIM schedule/step tests.

diffusers is not installed in this image, so parity is established two ways:
  1. structural identities of the published algorithms (zero-terminal SNR,
     trailing spacing grid, alpha-bar recursion);
  2. an independent brute-force reimplementation of the DDIM update written
     directly from eq. 12 of arXiv 2010.02502, checked against the
     vectorized table-driven step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ezaudio_tpu.diffusion.ddim import DDIMSchedule, make_betas, rescale_zero_terminal_snr

DIFF_CFG = dict(
    num_train_timesteps=1000,
    beta_schedule="scaled_linear",
    beta_start=0.00085,
    beta_end=0.012,
    prediction_type="v_prediction",
    rescale_betas_zero_snr=True,
    timestep_spacing="trailing",
    clip_sample=False,
)


def test_scaled_linear_betas():
    betas = make_betas(1000, "scaled_linear", 0.00085, 0.012)
    assert abs(betas[0] - 0.00085) < 1e-12
    assert abs(betas[-1] - 0.012) < 1e-12
    # sqrt-linearity
    s = np.sqrt(betas)
    d = np.diff(s)
    np.testing.assert_allclose(d, d[0], rtol=1e-9)


def test_zero_terminal_snr():
    betas = make_betas(1000, "scaled_linear", 0.00085, 0.012)
    rb = rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1 - rb)
    # terminal alpha-bar is exactly zero -> SNR(T) = 0
    assert abar[-1] < 1e-12
    # first-step alpha-bar preserved
    np.testing.assert_allclose(abar[0], 1 - betas[0], rtol=1e-8)
    # monotone decreasing
    assert np.all(np.diff(abar) < 0)


def test_trailing_timesteps_grid():
    sched = DDIMSchedule.from_config(DIFF_CFG)
    ts = sched.timesteps(100)
    # trailing spacing: 999, 989, ..., 9  (always includes the last train step)
    assert ts[0] == 999 and ts[-1] == 9 and len(ts) == 100
    np.testing.assert_array_equal(np.diff(ts), -10)
    ts50 = sched.timesteps(50)
    assert ts50[0] == 999 and len(ts50) == 50
    np.testing.assert_array_equal(np.diff(ts50), -20)


def test_step_tables_final_alpha():
    sched = DDIMSchedule.from_config(DIFF_CFG)
    a_t, a_prev, ts = sched.step_tables(100)
    # first inference step uses the zero-SNR terminal alpha
    assert a_t[0] < 1e-12
    # last step's prev timestep is 9-10=-1 -> final_alpha_cumprod = 1
    assert a_prev[-1] == 1.0
    np.testing.assert_allclose(a_prev[:-1], a_t[1:], rtol=1e-6)


def test_ddim_step_deterministic_brute_force(rng):
    """Check the table-driven step against eq. 12 of arXiv 2010.02502."""
    sched = DDIMSchedule.from_config(dict(DIFF_CFG, rescale_betas_zero_snr=False))
    a_t_all, a_prev_all, ts = sched.step_tables(50)
    x = rng.standard_normal((2, 8, 4)).astype(np.float32)
    v = rng.standard_normal((2, 8, 4)).astype(np.float32)

    for i in [0, 10, 49]:
        a_t, a_prev = float(a_t_all[i]), float(a_prev_all[i])
        got = np.asarray(sched.ddim_step(jnp.asarray(v), jnp.asarray(x),
                                         jnp.float32(a_t), jnp.float32(a_prev), eta=0.0))
        # brute force, v-pred
        x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
        eps = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
        want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_ddim_eta_variance_formula(rng):
    sched = DDIMSchedule.from_config(dict(DIFF_CFG, rescale_betas_zero_snr=False))
    a_t_all, a_prev_all, _ = sched.step_tables(50)
    i = 25
    a_t, a_prev = float(a_t_all[i]), float(a_prev_all[i])
    x = rng.standard_normal((1, 4, 4)).astype(np.float32)
    v = rng.standard_normal((1, 4, 4)).astype(np.float32)
    n = rng.standard_normal((1, 4, 4)).astype(np.float32)
    got = np.asarray(sched.ddim_step(jnp.asarray(v), jnp.asarray(x),
                                     jnp.float32(a_t), jnp.float32(a_prev),
                                     eta=1.0, noise=jnp.asarray(n)))
    var = ((1 - a_prev) / (1 - a_t)) * (1 - a_t / a_prev)
    std = np.sqrt(var)
    x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
    eps = np.sqrt(a_t) * v + np.sqrt(1 - a_t) * x
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev - var) * eps + std * n
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_add_noise_and_velocity_roundtrip(rng):
    """v-parameterization identity: x_t = sqrt(a) x0 + sqrt(1-a) eps and
    x0 = sqrt(a) x_t - sqrt(1-a) v  must be consistent."""
    sched = DDIMSchedule.from_config(DIFF_CFG)
    x0 = rng.standard_normal((3, 6, 2)).astype(np.float32)
    eps = rng.standard_normal((3, 6, 2)).astype(np.float32)
    t = jnp.asarray([10, 500, 900])
    xt = sched.add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
    vel = sched.get_velocity(jnp.asarray(x0), jnp.asarray(eps), t)
    a = jnp.asarray(sched.alphas_cumprod)[t][:, None, None]
    x0_rec = jnp.sqrt(a) * xt - jnp.sqrt(1 - a) * vel
    np.testing.assert_allclose(np.asarray(x0_rec), x0, atol=1e-5)


def test_snr():
    sched = DDIMSchedule.from_config(dict(DIFF_CFG, rescale_betas_zero_snr=False))
    snr = np.asarray(sched.snr(jnp.asarray([0, 500, 999])))
    abar = sched.alphas_cumprod
    np.testing.assert_allclose(snr, abar[[0, 500, 999]] / (1 - abar[[0, 500, 999]]), rtol=1e-5)
    assert snr[0] > snr[1] > snr[2]
