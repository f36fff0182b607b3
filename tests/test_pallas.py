"""Pallas kernel correctness (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.ops.attention import dot_product_attention
from ezaudio_tpu.ops.pallas.attention import fused_attention


class TestFusedAttention:
    @pytest.mark.parametrize("B,H,Lq,Lk,D", [
        (2, 4, 500, 500, 64),   # EzAudio-L self-attention geometry
        (1, 2, 500, 100, 72),   # XL cross-attention geometry (odd head dim)
        (1, 1, 16, 16, 8),
    ])
    def test_matches_einsum(self, rng, B, H, Lq, Lk, D):
        q = jnp.asarray(rng.standard_normal((B, H, Lq, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, Lk, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, Lk, D)).astype(np.float32))
        got = fused_attention(q, k, v, interpret=True)
        want = dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_key_mask(self, rng):
        B, H, Lq, Lk, D = 2, 2, 32, 48, 16
        q = jnp.asarray(rng.standard_normal((B, H, Lq, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, Lk, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, Lk, D)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, Lk)) > 0.4)
        got = fused_attention(q, k, v, key_mask=mask, interpret=True)
        want = dot_product_attention(q, k, v, mask=mask[:, None, None, :])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_custom_scale(self, rng):
        B, H, L, D = 1, 1, 24, 16
        q = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        got = fused_attention(q, k, v, scale=0.5, interpret=True)
        want = dot_product_attention(q, k, v, scale=0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFusedAttentionVJP:
    def test_grads_match_einsum(self, rng):
        B, H, L, D = 1, 2, 24, 16
        q = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, L)) > 0.3)

        def f_pallas(q, k, v):
            return jnp.sum(fused_attention(q, k, v, key_mask=mask,
                                           interpret=True) ** 2)

        def f_einsum(q, k, v):
            return jnp.sum(dot_product_attention(
                q, k, v, mask=mask[:, None, None, :]) ** 2)

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        ge = jax.grad(f_einsum, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, ge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


class TestFusedResidualUnit:
    """Fused snake-conv-snake-conv residual kernel (ops/pallas/resunit.py)."""

    def _inputs(self, rng, B=2, L=75, C=16, dtype=np.float32):
        x = jnp.asarray(rng.standard_normal((B, L, C)).astype(dtype))
        w7 = jnp.asarray((rng.standard_normal((7, C, C)) * 0.1).astype(dtype))
        b7 = jnp.asarray(rng.standard_normal(C).astype(dtype))
        w1 = jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(dtype))
        b1 = jnp.asarray(rng.standard_normal(C).astype(dtype))
        snk = [jnp.asarray(np.exp(rng.standard_normal(C).astype(np.float32) * 0.1))
               for _ in range(4)]
        return x, w7, b7, w1, b1, *snk

    @pytest.mark.parametrize("dilation", [1, 3, 9])
    def test_kernel_matches_reference(self, rng, dilation):
        from ezaudio_tpu.ops.pallas.resunit import (
            fused_residual_unit, residual_unit_reference)

        args = self._inputs(rng)
        got = fused_residual_unit(*args, dilation, True)  # interpret kernel
        want = residual_unit_reference(*args, dilation)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_multi_tile_seams(self, rng):
        """L spanning several tiles: the halo hand-off must be seamless."""
        from ezaudio_tpu.ops.pallas import resunit
        from ezaudio_tpu.ops.pallas.resunit import (
            fused_residual_unit, residual_unit_reference)

        args = self._inputs(rng, B=1, L=300, C=8)
        orig = resunit._pick_tile
        resunit._pick_tile = lambda c: 128  # force n_t > 1
        try:
            got = fused_residual_unit(*args, 9, True)
        finally:
            resunit._pick_tile = orig
        want = residual_unit_reference(*args, 9)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_grads_match_composition(self, rng):
        from ezaudio_tpu.ops.pallas.resunit import (
            fused_residual_unit, residual_unit_reference)

        args = self._inputs(rng, B=1, L=40, C=8)

        def f_fused(*a):
            return jnp.sum(fused_residual_unit(*a, 3, True) ** 2)

        def f_ref(*a):
            return jnp.sum(residual_unit_reference(*a, 3) ** 2)

        gf = jax.grad(f_fused, argnums=tuple(range(9)))(*args)
        gr = jax.grad(f_ref, argnums=tuple(range(9)))(*args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)


class TestFusedDecode:
    def test_decode_fused_matches_flax(self, rng):
        """The functional fused decoder must reproduce OobleckDecoder.apply
        bit-for-tolerance on the same param tree (CPU: identical-math
        composition; the kernel itself is covered in interpret mode above)."""
        import jax as _jax
        from ezaudio_tpu.codecs.oobleck import AudioVAE
        from ezaudio_tpu.codecs.oobleck_fast import decode_fused_for

        vae = AudioVAE(channels=8, latent_dim=4, c_mults=(1, 2),
                       strides=(2, 3))
        z = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
        params = vae.init({"params": _jax.random.PRNGKey(0),
                           "sample": _jax.random.PRNGKey(1)},
                          jnp.zeros((1, 24, 1)))["params"]
        want = vae.apply({"params": params}, z,
                         method=lambda m, zz: m.decoder(zz))
        got = decode_fused_for(vae, params, z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_facade_routes_fused(self, rng, monkeypatch):
        """Facade decode parity flax-vs-fused through the public seam."""
        import json
        import os as _os
        from ezaudio_tpu.codecs.facade import AutoencoderFacade
        from ezaudio_tpu.codecs.oobleck import AudioVAE

        vae = AudioVAE(channels=8, latent_dim=4, c_mults=(1, 2),
                       strides=(2, 3))
        params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 24, 1)))["params"]
        z = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))

        monkeypatch.setenv("EZAUDIO_VAE_FUSED", "0")
        ref = AutoencoderFacade(vae, params).decode(z)
        monkeypatch.setenv("EZAUDIO_VAE_FUSED", "1")
        fused = AutoencoderFacade(vae, params).decode(z)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-5)

    def test_encode_fused_matches_flax(self, rng):
        from ezaudio_tpu.codecs.oobleck import AudioVAE
        from ezaudio_tpu.codecs.oobleck_fast import encode_fused_for

        vae = AudioVAE(channels=8, latent_dim=4, c_mults=(1, 2),
                       strides=(2, 3))
        audio = jnp.asarray(rng.standard_normal((2, 36, 1)).astype(np.float32))
        params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 24, 1)))["params"]
        want = vae.apply({"params": params}, audio,
                         method=lambda m, a: m.encoder(a))
        got = encode_fused_for(vae, params, audio)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_facade_encode_routes_fused(self, rng, monkeypatch):
        from ezaudio_tpu.codecs.facade import AutoencoderFacade
        from ezaudio_tpu.codecs.oobleck import AudioVAE

        vae = AudioVAE(channels=8, latent_dim=4, c_mults=(1, 2),
                       strides=(2, 3))
        params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)},
                          jnp.zeros((1, 24, 1)))["params"]
        audio = jnp.asarray(rng.standard_normal((1, 36, 1)).astype(np.float32))

        monkeypatch.setenv("EZAUDIO_VAE_FUSED", "0")
        ref = AutoencoderFacade(vae, params).encode(audio, sample=False)
        monkeypatch.setenv("EZAUDIO_VAE_FUSED", "1")
        fused = AutoencoderFacade(vae, params).encode(audio, sample=False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-5)
