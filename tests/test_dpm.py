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


def cfg_invariant_model(x, t):
    """cond == uncond == 0.7x: the guidance delta is exactly zero, so the
    pair ('uncond + s*0'), delta-reuse ('cond + (s-1)*0') and plain modes
    all reduce to the same floating-point value — ANY cfg_refresh_interval
    must match the standard pair (up to ulp-level fusion/FMA differences
    between the differently-structured compiled scans)."""
    return 0.7 * x


class TestDPMCfgRefresh:
    """cfg_refresh_interval: uncond branch recomputed only every P-th
    in-band step/group; other in-band steps run cond-only with the carried
    guidance delta."""

    def _noise(self, rng):
        return jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32))

    def _cache_fns(self, model):
        def full(x, t):
            return model(x, t), jnp.float32(0.0)

        def cached(x, t, deep):
            return model(x, t) + 0.0 * deep

        return full, cached

    def test_p1_is_default(self, rng):
        noise = self._noise(rng)
        ref = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_scale=3.0, guidance_rescale=0.3)
        got = dpm_solver_sample(cfg_aware_model, SCHED, noise, 8,
                                guidance_scale=3.0, guidance_rescale=0.3,
                                cfg_refresh_interval=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_zero_delta_oracle_bit_equal(self, rng):
        """CFG-invariant model: every P must match P=1 (ulp-tolerance:
        the super-step scans compile to different fusions/FMAs), with and
        without a guidance band."""
        noise = self._noise(rng)
        for band in (None, (300.0, 800.0)):
            ref = dpm_solver_sample(cfg_invariant_model, SCHED, noise, 9,
                                    guidance_scale=3.0,
                                    guidance_interval=band)
            for p in (2, 3, 8):
                got = dpm_solver_sample(cfg_invariant_model, SCHED, noise, 9,
                                        guidance_scale=3.0,
                                        guidance_interval=band,
                                        cfg_refresh_interval=p)
                np.testing.assert_allclose(np.asarray(got),
                                           np.asarray(ref), atol=1e-6)

    def test_reuse_approximates_pair(self, rng):
        """With a CFG-sensitive model the P=2 trajectory is a strictly
        better approximation of full CFG than dropping guidance is, and
        is not identical to either."""
        noise = self._noise(rng)
        full = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 12, guidance_scale=3.0))
        nocfg = np.asarray(dpm_solver_sample(cfg_aware_model, SCHED,
                                             noise, 12))
        p2 = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 12, guidance_scale=3.0,
            cfg_refresh_interval=2))
        assert np.isfinite(p2).all()
        assert np.abs(p2 - full).max() > 0
        assert np.abs(p2 - nocfg).max() > 0
        assert np.abs(p2 - full).mean() < np.abs(nocfg - full).mean()

    def test_composes_with_cache_and_band(self, rng):
        """layer caching + guidance band + P=2: the zero-delta oracle stays
        at P=1's trajectory through the group-unrolled scan machinery
        (ulp-tolerance for cross-program fusion differences)."""
        noise = self._noise(rng)
        full_fn, cached_fn = self._cache_fns(cfg_invariant_model)
        kw = dict(guidance_scale=3.0, layer_cache_fns=(full_fn, cached_fn),
                  cache_interval=2, guidance_interval=(300.0, 800.0))
        ref = dpm_solver_sample(cfg_invariant_model, SCHED, noise, 12, **kw)
        for p in (2, 3):
            got = dpm_solver_sample(cfg_invariant_model, SCHED, noise, 12,
                                    cfg_refresh_interval=p, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)
        # CFG-sensitive model: finite and distinct from the P=1 trajectory
        full_fn, cached_fn = self._cache_fns(cfg_aware_model)
        kw["layer_cache_fns"] = (full_fn, cached_fn)
        p1 = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 12, **kw))
        p2 = np.asarray(dpm_solver_sample(
            cfg_aware_model, SCHED, noise, 12, cfg_refresh_interval=2, **kw))
        assert np.isfinite(p2).all()
        assert np.abs(p2 - p1).max() > 0

    def test_invalid_p_raises(self, rng):
        import pytest

        with pytest.raises(ValueError, match="cfg_refresh_interval"):
            dpm_solver_sample(cfg_aware_model, SCHED, self._noise(rng), 8,
                              guidance_scale=3.0, cfg_refresh_interval=0)
