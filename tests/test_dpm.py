"""DPM-Solver++(2M) sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.diffusion.dpm import dpm_solver_sample
from ezaudio_tpu.diffusion.sampling import sample_latents
from tests.tiny_config import TINY_CONFIG

SCHED = DDIMSchedule.from_config(TINY_CONFIG["diff"])
ABAR = jnp.asarray(SCHED.alphas_cumprod)


def oracle_model(target):
    """A model whose x0 prediction is exactly ``target`` at every t:
    v = (sqrt(abar_t) x - target) / sqrt(1 - abar_t)."""

    def fn(x, t):
        a = ABAR[t]
        return (jnp.sqrt(a) * x - target) / jnp.sqrt(1.0 - a)

    return fn


class TestDPMSolver:
    def test_exact_on_oracle(self, rng):
        """With a perfect x0 oracle, the solver lands exactly on x0 at ANY
        step count (incl. the zero-SNR first step)."""
        target = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))
        for steps in (2, 5, 20):
            out = dpm_solver_sample(oracle_model(target), SCHED, noise, steps)
            np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                       atol=1e-4)

    def test_matches_ddim_eta0_asymptotically(self, rng):
        """On a smooth linear model, DPM-Solver and DDIM(eta=0) converge to
        the same ODE solution; at moderate steps they should agree closely
        and DPM at 10 steps should be closer to DDIM@200 than DDIM@10 is."""
        noise = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))

        def model(x, t):
            return 0.7 * x  # linear v-predictor

        ref = np.asarray(sample_latents(model, SCHED, noise,
                                        jax.random.PRNGKey(0), 400, eta=0.0))
        ddim10 = np.asarray(sample_latents(model, SCHED, noise,
                                           jax.random.PRNGKey(0), 10, eta=0.0))
        dpm10 = np.asarray(dpm_solver_sample(model, SCHED, noise, 10))
        err_ddim = np.abs(ddim10 - ref).mean()
        err_dpm = np.abs(dpm10 - ref).mean()
        assert err_dpm < err_ddim, (err_dpm, err_ddim)

    def test_cfg_path(self, rng):
        noise = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))

        def fn(x, t):
            B = x.shape[0] // 2
            return jnp.concatenate([0.7 * x[:B], 0.5 * x[B:]], axis=0)

        out = dpm_solver_sample(fn, SCHED, noise, 8, guidance_scale=3.0,
                                guidance_rescale=0.5)
        assert np.isfinite(np.asarray(out)).all()


def cfg_aware_model(x, t):
    """Cond model = 0.7x; uncond = 0.5x when the CFG pair batch arrives
    (batch 4 = pair of 2), cond-only on the single batch (batch 2)."""
    if x.shape[0] == 4:
        return jnp.concatenate([0.7 * x[:2], 0.5 * x[2:]], axis=0)
    return 0.7 * x


class TestDPMGuidanceInterval:
    """guidance_interval on the DPM sampler: CFG only inside a timestep
    band; out-of-band steps run the cond-only model (half the compute).
    Segmented scans share one carry, so the 2M history crosses segments."""

    def _noise(self, rng):
        return jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))

    def test_full_band_equals_plain(self, rng):
        noise = self._noise(rng)
        ref = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_scale=3.0, guidance_rescale=0.3)
        got = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_scale=3.0, guidance_rescale=0.3,
                                guidance_interval=(0.0, 1000.0))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_empty_band_equals_no_cfg(self, rng):
        noise = self._noise(rng)
        ref = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8)
        got = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_scale=3.0,
                                guidance_interval=(2000.0, 3000.0))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_partial_band_differs_from_both(self, rng):
        noise = self._noise(rng)
        plain = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 8, guidance_scale=3.0))
        nocfg = np.asarray(dpm_solver_sample(cfg_aware_model, SCHED, noise, 8))
        band = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 8, guidance_scale=3.0,
            guidance_interval=(300.0, 800.0)))
        assert np.isfinite(band).all()
        assert np.abs(band - plain).max() > 1e-6
        assert np.abs(band - nocfg).max() > 1e-6

    def test_ignored_without_guidance_scale(self, rng):
        noise = self._noise(rng)
        ref = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8)
        got = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_interval=(300.0, 800.0))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_reversed_band_raises(self, rng):
        """A reversed (t_hi, t_lo) tuple would silently disable CFG
        everywhere — it must raise instead (both sampler families)."""
        import pytest

        with pytest.raises(ValueError, match="t_lo <= t_hi"):
            dpm_solver_sample(cfg_aware_model, SCHED, self._noise(rng), 8,
                              guidance_scale=3.0,
                              guidance_interval=(800.0, 300.0))
        with pytest.raises(ValueError, match="t_lo <= t_hi"):
            sample_latents(cfg_aware_model, SCHED, self._noise(rng),
                           jax.random.PRNGKey(0), 8, guidance_scale=3.0,
                           guidance_interval=(800.0, 300.0))
