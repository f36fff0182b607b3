"""Cross-step DiT layer caching (training-free acceleration).

The deep U-stack features drift slowly across adjacent diffusion steps
(the layer-caching direction from the retrieved DiT-acceleration papers);
udit.py's ``collect_deep_k``/``deep_cache`` splits the network so cached
steps recompute only the shallow layers.  These tests pin the structural
guarantees:

  * the split is EXACT at the collection timestep — a cached forward fed
    the just-collected deep activation reproduces the full forward;
  * ``cache_interval=1`` degenerates to the plain DDIM sampler exactly;
  * interval>1 sampling stays finite and close to the uncached result;
  * the public API knob works end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.diffusion.sampling import (
    sample_latents, sample_latents_layer_cached)
from ezaudio_tpu.models.maskdit import maskdit_from_config
from tests.tiny_config import TINY_CONFIG

DIFF = dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
            beta_start=0.00085, beta_end=0.012,
            prediction_type="v_prediction", rescale_betas_zero_snr=True,
            timestep_spacing="trailing", clip_sample=False)


@pytest.fixture(scope="module")
def setup():
    cfg = dict(TINY_CONFIG["model"])  # depth 4 -> half=2, valid k=1
    model = maskdit_from_config(cfg)
    key = jax.random.PRNGKey(0)
    L, C, Dc = cfg["img_size"], cfg["out_chans"], cfg["context_dim"]
    params = model.init({"params": key, "mask": key},
                        jnp.zeros((1, L, C)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, Dc)))
    # perturb every param: the AdaLN heads are zero-initialized, so a
    # freshly-initialized model ignores t entirely (deep(t0) == deep(t1)
    # trivially) — noise makes the time conditioning live
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    x = jax.random.normal(key, (2, L, C))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, Dc))
    return model, params, x, ctx


class TestCacheSplit:
    def test_cached_forward_exact_at_collection_step(self, setup):
        model, params, x, ctx = setup
        t = jnp.full((2,), 500, jnp.int32)
        (out_full, deep), _ = model.apply(params, x, t, ctx, collect_deep_k=1)
        out_cached, _ = model.apply(params, x, t, ctx, deep_cache=(1, deep))
        np.testing.assert_allclose(np.asarray(out_cached),
                                   np.asarray(out_full), atol=1e-6)

    def test_full_path_unchanged_by_collection(self, setup):
        model, params, x, ctx = setup
        t = jnp.full((2,), 123, jnp.int32)
        out_plain, _ = model.apply(params, x, t, ctx)
        (out_collect, deep), _ = model.apply(params, x, t, ctx,
                                             collect_deep_k=1)
        np.testing.assert_array_equal(np.asarray(out_plain),
                                      np.asarray(out_collect))
        assert deep.shape[-1] == 64  # embed_dim activation, not output

    def test_cached_differs_at_other_timestep(self, setup):
        """The approximation is real: deep collected at t=500 used at t=400
        gives a different (but finite) result than the full forward."""
        model, params, x, ctx = setup
        t0 = jnp.full((2,), 500, jnp.int32)
        t1 = jnp.full((2,), 400, jnp.int32)
        (_, deep), _ = model.apply(params, x, t0, ctx, collect_deep_k=1)
        approx, _ = model.apply(params, x, t1, ctx, deep_cache=(1, deep))
        exact, _ = model.apply(params, x, t1, ctx)
        assert np.isfinite(np.asarray(approx)).all()
        assert np.abs(np.asarray(approx) - np.asarray(exact)).max() > 1e-6

    def test_invalid_k_raises(self, setup):
        model, params, x, ctx = setup
        t = jnp.full((2,), 1, jnp.int32)
        with pytest.raises(AssertionError):
            model.apply(params, x, t, ctx, collect_deep_k=2)  # k == half


def cache_fns(setup):
    model, params, x, ctx = setup

    def model_full(lat, t):
        n = lat.shape[0]
        c = jnp.concatenate([ctx] * (n // 2), axis=0)
        (out, deep), _ = model.apply(params, lat, t, c, collect_deep_k=1)
        return out, deep

    def model_cached(lat, t, deep):
        n = lat.shape[0]
        c = jnp.concatenate([ctx] * (n // 2), axis=0)
        out, _ = model.apply(params, lat, t, c, deep_cache=(1, deep))
        return out

    def model_plain(lat, t):
        n = lat.shape[0]
        c = jnp.concatenate([ctx] * (n // 2), axis=0)
        out, _ = model.apply(params, lat, t, c)
        return out

    return model_full, model_cached, model_plain


class TestCachedSampler:
    def test_interval_1_equals_plain_sampler(self, setup):
        model, params, x, ctx = setup
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
        key = jax.random.PRNGKey(3)
        ref = jax.jit(lambda: sample_latents(
            plain, schedule, noise, key, 6, guidance_scale=3.0, eta=1.0))()
        got = jax.jit(lambda: sample_latents_layer_cached(
            full, cached, schedule, noise, key, 6, cache_interval=1,
            guidance_scale=3.0, eta=1.0))()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_interval_2_close_and_finite(self, setup):
        model, params, x, ctx = setup
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(4), x.shape)
        key = jax.random.PRNGKey(5)
        ref = np.asarray(jax.jit(lambda: sample_latents(
            plain, schedule, noise, key, 8, guidance_scale=3.0, eta=0.0))())
        got = np.asarray(jax.jit(lambda: sample_latents_layer_cached(
            full, cached, schedule, noise, key, 8, cache_interval=2,
            guidance_scale=3.0, eta=0.0))())
        assert np.isfinite(got).all()
        assert np.abs(got - ref).max() > 0  # approximation engaged
        c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert c > 0.95, c

    def test_remainder_steps(self, setup):
        """num_steps not divisible by interval: the tail runs full calls."""
        model, params, x, ctx = setup
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(6), x.shape)
        got = np.asarray(jax.jit(lambda: sample_latents_layer_cached(
            full, cached, schedule, noise, jax.random.PRNGKey(7), 7,
            cache_interval=3, guidance_scale=None, eta=1.0))())
        assert np.isfinite(got).all()


class TestDPMLayerCache:
    def test_cache_fns_interval_1_matches_plain_dpm(self, setup):
        from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

        model, params, x, ctx = setup
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(8), x.shape)
        ref = jax.jit(lambda: dpm_solver_sample(
            plain, schedule, noise, 8, guidance_scale=3.0))()
        # cache_interval=1 disables caching entirely (plain scan path)
        got = jax.jit(lambda: dpm_solver_sample(
            plain, schedule, noise, 8, guidance_scale=3.0,
            layer_cache_fns=(full, cached), cache_interval=1))()
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_dpm_interval_2_close_and_finite(self, setup):
        from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

        model, params, x, ctx = setup
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(9), x.shape)
        ref = np.asarray(jax.jit(lambda: dpm_solver_sample(
            plain, schedule, noise, 8, guidance_scale=3.0))())
        got = np.asarray(jax.jit(lambda: dpm_solver_sample(
            plain, schedule, noise, 8, guidance_scale=3.0,
            layer_cache_fns=(full, cached), cache_interval=2))())
        assert np.isfinite(got).all()
        assert np.abs(got - ref).max() > 0
        c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert c > 0.95, c


class TestAPILayerCache:
    def test_generate_with_layer_cache(self):
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        _, w_ref = ez.generate_audio("rain", length=2, ddim_steps=6,
                                     random_seed=9)
        _, w_lc1 = ez.generate_audio("rain", length=2, ddim_steps=6,
                                     random_seed=9, layer_cache=(1, 1))
        np.testing.assert_allclose(w_lc1, w_ref, atol=1e-5)
        _, w_lc2 = ez.generate_audio("rain", length=2, ddim_steps=6,
                                     random_seed=9, layer_cache=(1, 2))
        assert np.isfinite(w_lc2).all()
        assert np.abs(w_lc2 - w_ref).max() > 0
        c = np.corrcoef(w_ref, w_lc2)[0, 1]
        assert c > 0.9, c

    def test_editing_with_layer_cache(self):
        from tests.tiny_config import TINY_SR, make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        gt = (0.5 * np.sin(2 * np.pi * 110 * np.arange(2 * TINY_SR)
                           / TINY_SR)).astype(np.float32)
        sr, out = ez.editing_audio("a dog", boundary=0.25, gt_file=gt,
                                   mask_start=0.5, mask_length=0.5,
                                   ddim_steps=4, random_seed=0,
                                   layer_cache=(1, 2))
        assert out.shape == gt.shape and np.isfinite(out).all()
        # context outside the edit window is still pasted back untouched
        norm = gt / (np.max(np.abs(gt)) + 1e-9)
        np.testing.assert_array_equal(out[: int(0.2 * TINY_SR)],
                                      norm[: int(0.2 * TINY_SR)])

    def test_generate_dpm_with_layer_cache(self):
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        _, w_ref = ez.generate_audio("rain", length=2, ddim_steps=6,
                                     random_seed=9, sampler="dpm")
        _, w_lc = ez.generate_audio("rain", length=2, ddim_steps=6,
                                    random_seed=9, sampler="dpm",
                                    layer_cache=(1, 2))
        assert np.isfinite(w_lc).all()
        assert np.abs(w_lc - w_ref).max() > 0
        c = np.corrcoef(w_ref, w_lc)[0, 1]
        assert c > 0.9, c


class TestLayerCacheGuidanceInterval:
    """guidance_interval x layer_cache composition: the CFG band rounds
    outward to cache-group boundaries (full + cached calls within a group
    must share a batch size)."""

    def _run_ddim(self, setup, noise, **kw):
        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        return np.asarray(jax.jit(lambda: sample_latents_layer_cached(
            full, cached, schedule, noise, jax.random.PRNGKey(11), 8,
            cache_interval=2, eta=1.0, **kw))())

    def test_full_band_equals_plain_lc(self, setup):
        noise = jax.random.normal(jax.random.PRNGKey(10), setup[2].shape)
        ref = self._run_ddim(setup, noise, guidance_scale=3.0)
        got = self._run_ddim(setup, noise, guidance_scale=3.0,
                             guidance_interval=(0.0, 1000.0))
        np.testing.assert_array_equal(got, ref)

    def test_empty_band_equals_no_cfg_lc(self, setup):
        noise = jax.random.normal(jax.random.PRNGKey(12), setup[2].shape)
        ref = self._run_ddim(setup, noise, guidance_scale=None)
        got = self._run_ddim(setup, noise, guidance_scale=3.0,
                             guidance_interval=(2000.0, 3000.0))
        np.testing.assert_array_equal(got, ref)

    def test_band_rounds_outward_to_cache_groups(self, setup):
        """A band touching only step 3 turns CFG on for its whole group
        (steps 2-3 at interval 2) — identical to the band covering both."""
        schedule = DDIMSchedule.from_config(DIFF)
        ts = schedule.step_tables(8)[2]
        noise = jax.random.normal(jax.random.PRNGKey(13), setup[2].shape)
        only3 = self._run_ddim(setup, noise, guidance_scale=3.0,
                               guidance_interval=(float(ts[3]), float(ts[3])))
        both = self._run_ddim(
            setup, noise, guidance_scale=3.0,
            guidance_interval=(float(ts[3]), float(ts[2])))
        np.testing.assert_array_equal(only3, both)
        # and the rounded band is a real partial schedule (not all-CFG)
        full = self._run_ddim(setup, noise, guidance_scale=3.0)
        assert np.abs(only3 - full).max() > 0

    def test_dpm_lc_gi_composition(self, setup):
        from ezaudio_tpu.diffusion.dpm import dpm_solver_sample

        full, cached, plain = cache_fns(setup)
        schedule = DDIMSchedule.from_config(DIFF)
        noise = jax.random.normal(jax.random.PRNGKey(14), setup[2].shape)

        def run(**kw):
            return np.asarray(jax.jit(lambda: dpm_solver_sample(
                plain, schedule, noise, 8, guidance_scale=3.0,
                layer_cache_fns=(full, cached), cache_interval=2, **kw))())

        ref = run()
        np.testing.assert_array_equal(
            run(guidance_interval=(0.0, 1000.0)), ref)
        band = run(guidance_interval=(300.0, 800.0))
        assert np.isfinite(band).all()
        assert np.abs(band - ref).max() > 0
