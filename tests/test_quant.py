"""Dynamic int8 (W8A8) quantization: op accuracy, Linear wiring, API e2e.

ops/quant.py has no reference analog (the torch repo is fp16-AMP-only,
src/train.py:33); it exists because the TPU v5e MXU runs int8 at 2x the
bf16 rate and the sampler is compute-bound (BASELINE.md probe6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.ops.quant import (
    int8_dot, quant_context, quantize_symmetric, current_quant_mode)


class TestQuantOps:
    def test_quantize_roundtrip_error(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
        q, s = quantize_symmetric(x, axis=-1)
        assert q.dtype == jnp.int8
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
        # max error is half an LSB of the per-row scale
        assert (err <= 0.5 * np.asarray(s) + 1e-7).all()

    def test_int8_dot_close_to_float(self):
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (32, 256))
        w = jax.random.normal(jax.random.PRNGKey(2), (256, 512)) * 0.05
        exact = x @ w
        q = int8_dot(x, w)
        rel = np.linalg.norm(np.asarray(q - exact)) / np.linalg.norm(np.asarray(exact))
        assert rel < 0.02, rel  # ~1% typical for W8A8 on gaussian data

    def test_int8_dot_batched_rank3(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 128))
        w = jax.random.normal(jax.random.PRNGKey(4), (128, 64))
        exact = jnp.einsum("bld,dk->blk", x, w)
        q = int8_dot(x, w)
        assert q.shape == exact.shape
        rel = np.linalg.norm(np.asarray(q - exact)) / np.linalg.norm(np.asarray(exact))
        assert rel < 0.02, rel

    def test_scale_invariance_per_row(self):
        """Per-row dynamic scales: scaling one activation row must not
        degrade another row's accuracy (the point of per-token quant)."""
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 128))
        x = x.at[0].mul(1000.0)  # huge outlier row
        w = jax.random.normal(jax.random.PRNGKey(6), (128, 64)) * 0.1
        exact = np.asarray(x @ w)
        q = np.asarray(int8_dot(x, w))
        rel_row3 = np.linalg.norm(q[3] - exact[3]) / np.linalg.norm(exact[3])
        assert rel_row3 < 0.02, rel_row3

    def test_context_nesting(self):
        assert current_quant_mode() is None
        with quant_context("int8"):
            assert current_quant_mode() == "int8"
            with quant_context(None):
                assert current_quant_mode() is None
            assert current_quant_mode() == "int8"
        assert current_quant_mode() is None


class TestLinearQuant:
    def test_large_linear_quantizes(self):
        from ezaudio_tpu.ops.convs import Linear

        lin = Linear(in_features=256, out_features=256)
        x = jax.random.normal(jax.random.PRNGKey(7), (8, 256))
        params = lin.init(jax.random.PRNGKey(8), x)
        y_f = lin.apply(params, x)
        with quant_context("int8"):
            y_q = jax.jit(lambda p, x: lin.apply(p, x))(params, x)
        d = np.asarray(y_q - y_f)
        assert np.abs(d).max() > 0  # the path actually changed
        rel = np.linalg.norm(d) / np.linalg.norm(np.asarray(y_f))
        assert rel < 0.03, rel

    def test_small_linear_stays_float(self):
        from ezaudio_tpu.ops.convs import Linear

        lin = Linear(in_features=16, out_features=16)
        x = jax.random.normal(jax.random.PRNGKey(9), (4, 16))
        params = lin.init(jax.random.PRNGKey(10), x)
        y_f = lin.apply(params, x)
        with quant_context("int8"):
            y_q = lin.apply(params, x)
        np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_f))


class TestAPIQuant:
    def test_generate_int8_close_to_float(self, monkeypatch):
        """Full pipeline under quant='int8' (threshold lowered so the tiny
        config's 64-dim linears quantize): finite audio, strongly
        correlated with the float output from the same seed."""
        import ezaudio_tpu.ops.quant as quant_mod
        from tests.tiny_config import make_tiny_ezaudio

        monkeypatch.setattr(quant_mod, "MIN_QUANT_ELEMENTS", 64 * 64)
        ez = make_tiny_ezaudio()
        _, w_f = ez.generate_audio("rain", length=2, ddim_steps=5,
                                   random_seed=11)
        _, w_q = ez.generate_audio("rain", length=2, ddim_steps=5,
                                   random_seed=11, quant="int8")
        assert np.isfinite(w_q).all()
        assert np.abs(w_q - w_f).max() > 0  # int8 path actually ran
        c = np.corrcoef(w_f, w_q)[0, 1]
        assert c > 0.99, c


class TestQuantOffGuard:
    def test_off_overrides_env(self, monkeypatch):
        monkeypatch.setenv("EZAUDIO_QUANT", "int8")
        assert current_quant_mode() == "int8"
        with quant_context("off"):
            assert current_quant_mode() is None
            with quant_context("int8"):  # explicit opt-in still wins
                assert current_quant_mode() == "int8"
        assert current_quant_mode() == "int8"

    def test_train_step_ignores_env_quant(self, monkeypatch):
        """EZAUDIO_QUANT=int8 in the environment must NOT leak into the
        training trace (round() has zero gradient): the jitted train step
        contains no i8 tensors and large-linear grads are nonzero."""
        import optax

        from ezaudio_tpu.ops.convs import Linear

        monkeypatch.setenv("EZAUDIO_QUANT", "int8")
        lin = Linear(in_features=256, out_features=256)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 256))
        params = lin.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.mean(lin.apply(p, x) ** 2)

        # inference trace (no guard): the env var applies
        with quant_context(None):
            txt_inf = jax.jit(loss).lower(params).as_text()
        assert "i8" in txt_inf
        # training trace (guard): no int8 anywhere, real gradients
        with quant_context("off"):
            txt = jax.jit(jax.grad(loss)).lower(params).as_text()
            g = jax.grad(loss)(params)
        assert "i8" not in txt
        assert float(jnp.abs(g["params"]["kernel"]).max()) > 0
