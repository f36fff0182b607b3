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
