"""Sequence-parallel ring attention: exactness, grads, and model wiring.

The ring (parallel/ring_attention.py) distributes the flash-attention block
loop over the mesh's ``sp`` axis with ppermute hops; these tests prove on
the 8-virtual-device CPU mesh that it is EXACT attention (not an
approximation) and that the Attention module's ``attention_impl='ring'``
path produces the same output as the default einsum path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.ops.attention import dot_product_attention
from ezaudio_tpu.parallel.mesh import make_mesh
from ezaudio_tpu.parallel.ring_attention import ring_attention, ring_context


def _mesh(dp=1, sp=4):
    return make_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])


def _qkv(key, B=2, H=4, L=64, D=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), dtype)
    k = jax.random.normal(kk, (B, H, L, D), dtype)
    v = jax.random.normal(kv, (B, H, L, D), dtype)
    return q, k, v


class TestRingExactness:
    def test_matches_dense_no_mask(self):
        mesh = _mesh(1, 8)
        q, k, v = _qkv(jax.random.PRNGKey(0))
        dense = dot_product_attention(q, k, v)
        ring = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_dense_with_key_mask(self):
        mesh = _mesh(1, 4)
        q, k, v = _qkv(jax.random.PRNGKey(1), L=48)
        key_mask = jax.random.bernoulli(
            jax.random.PRNGKey(2), 0.7, (2, 48))
        # keep at least one valid key per row
        key_mask = key_mask.at[:, 0].set(True)
        dense = dot_product_attention(
            q, k, v, mask=key_mask[:, None, None, :])
        ring = jax.jit(lambda q, k, v, m: ring_attention(
            q, k, v, mesh, key_mask=m))(q, k, v, key_mask)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def test_dp_times_sp_mesh(self):
        mesh = _mesh(2, 4)
        q, k, v = _qkv(jax.random.PRNGKey(3), B=4, L=32)
        dense = dot_product_attention(q, k, v)
        ring = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, mesh, batch_axes=("dp",)))(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def test_custom_scale(self):
        mesh = _mesh(1, 4)
        q, k, v = _qkv(jax.random.PRNGKey(4), L=32)
        dense = dot_product_attention(q, k, v, scale=0.25)
        ring = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, mesh, scale=0.25))(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16_inputs(self):
        mesh = _mesh(1, 4)
        q, k, v = _qkv(jax.random.PRNGKey(5), L=32, dtype=jnp.bfloat16)
        dense = dot_product_attention(q, k, v)
        ring = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
        assert ring.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(ring, np.float32), np.asarray(dense, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_indivisible_sequence_raises(self):
        mesh = _mesh(1, 8)
        q, k, v = _qkv(jax.random.PRNGKey(6), L=36)
        with pytest.raises(AssertionError):
            ring_attention(q, k, v, mesh)


class TestRingGradients:
    def test_grad_matches_dense(self):
        mesh = _mesh(1, 4)
        q, k, v = _qkv(jax.random.PRNGKey(7), L=32)

        def loss_dense(q, k, v):
            return (dot_product_attention(q, k, v) ** 2).sum()

        def loss_ring(q, k, v):
            return (ring_attention(q, k, v, mesh) ** 2).sum()

        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(gr, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestModuleRingImpl:
    def test_attention_module_ring_equals_einsum(self):
        from ezaudio_tpu.models.blocks import Attention

        mesh = _mesh(2, 4)
        B, L, D = 4, 32, 64
        x = jax.random.normal(jax.random.PRNGKey(8), (B, L, D))

        ein = Attention(dim=D, num_heads=4, rope_mode="shared",
                        attention_impl="einsum")
        rng = Attention(dim=D, num_heads=4, rope_mode="shared",
                        attention_impl="ring")
        params = ein.init(jax.random.PRNGKey(9), x)

        out_e = ein.apply(params, x)
        with ring_context(mesh, batch_axes=("dp",)):
            out_r = jax.jit(lambda p, x: rng.apply(p, x))(params, x)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_e),
                                   atol=1e-5, rtol=1e-5)

    def test_long_audio_sampling_ring_equals_einsum(self):
        """The sp story end-to-end: sample latents 4x LONGER than the
        training img_size (RoPE length extension) with the sequence
        sharded over sp=4 and ring attention — the result matches the
        unsharded einsum sampler.  This is the single-pass long-audio
        path that chained outpainting approximates in the reference."""
        from tests.tiny_config import TINY_CONFIG
        from ezaudio_tpu.diffusion.ddim import DDIMSchedule
        from ezaudio_tpu.diffusion.sampling import sample_latents
        from ezaudio_tpu.models.maskdit import maskdit_from_config

        mesh = _mesh(2, 4)
        cfg = dict(TINY_CONFIG["model"])
        L = 4 * cfg["img_size"]  # 400 latent frames vs 100 trained
        C, Dc = cfg["out_chans"], cfg["context_dim"]
        key = jax.random.PRNGKey(11)

        m_e = maskdit_from_config(cfg)
        m_r = maskdit_from_config(dict(cfg, attention_impl="ring"))
        params = m_e.init({"params": key, "mask": key},
                          jnp.zeros((1, cfg["img_size"], C)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 1, Dc)))
        ctx = jax.random.normal(key, (2, 6, Dc))
        noise = jax.random.normal(jax.random.PRNGKey(12), (2, L, C))

        diff = dict(num_train_timesteps=1000, beta_schedule="scaled_linear",
                    beta_start=0.00085, beta_end=0.012,
                    prediction_type="v_prediction",
                    rescale_betas_zero_snr=True,
                    timestep_spacing="trailing", clip_sample=False)
        schedule = DDIMSchedule.from_config(diff)

        def fn_for(model):
            def model_fn(lat, t):
                c = jnp.concatenate([ctx] * (lat.shape[0] // 2), axis=0)
                out, _ = model.apply(params, lat, t, c)
                return out
            return model_fn

        skey = jax.random.PRNGKey(13)
        ref = np.asarray(jax.jit(lambda n: sample_latents(
            fn_for(m_e), schedule, n, skey, 2, guidance_scale=3.0,
            eta=0.0))(noise))
        with ring_context(mesh, batch_axes=("dp",)):
            got = np.asarray(jax.jit(lambda n: sample_latents(
                fn_for(m_r), schedule, n, skey, 2, guidance_scale=3.0,
                eta=0.0))(noise))
        assert got.shape == (2, L, C)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    def test_ring_without_context_raises(self):
        from ezaudio_tpu.models.blocks import Attention

        x = jnp.zeros((1, 8, 16))
        attn = Attention(dim=16, num_heads=2, attention_impl="ring")
        with pytest.raises(AssertionError):
            attn.init(jax.random.PRNGKey(0), x)

    def test_maskdit_forward_ring_equals_einsum(self):
        """Whole-model proof: a tiny MaskDiT forward with sp-sharded ring
        self-attention matches the einsum forward (cross-attention and the
        rest of the network are untouched)."""
        from tests.tiny_config import TINY_CONFIG
        from ezaudio_tpu.models.maskdit import maskdit_from_config

        mesh = _mesh(2, 4)
        cfg = dict(TINY_CONFIG["model"])
        B, L = 2, cfg["img_size"]
        C = cfg["out_chans"]
        Dc = cfg["context_dim"]

        key = jax.random.PRNGKey(10)
        x = jax.random.normal(key, (B, L, C))
        t = jnp.full((B,), 321, jnp.int32)
        ctx = jax.random.normal(key, (B, 8, Dc))

        m_e = maskdit_from_config(cfg)
        m_r = maskdit_from_config(dict(cfg, attention_impl="ring"))
        params = m_e.init({"params": key, "mask": key}, x, t, ctx)

        out_e, _ = m_e.apply(params, x, t, ctx)
        with ring_context(mesh, batch_axes=("dp",)):
            out_r, _ = jax.jit(
                lambda p, x, t, c: m_r.apply(p, x, t, c))(params, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_e),
                                   atol=2e-5, rtol=2e-5)


class TestAutoRouting:
    def test_auto_routes_to_ring_inside_context(self):
        """attention_impl='auto' (the default) must honor the ring_context
        promise: inside a context whose mesh has sp>1, self-attention
        traces through the ring kernel (collective_permute in the HLO) and
        matches the einsum result; outside, plain einsum (no collectives)."""
        from ezaudio_tpu.models.blocks import Attention

        mesh = _mesh(2, 4)
        B, L, D = 4, 32, 64
        x = jax.random.normal(jax.random.PRNGKey(21), (B, L, D))
        attn = Attention(dim=D, num_heads=4, rope_mode="shared")  # auto
        params = attn.init(jax.random.PRNGKey(22), x)

        # NB: a FRESH function object per lower() — jax caches traces on
        # function identity, and the ring context is trace-time state
        txt_plain = jax.jit(
            lambda p, x: attn.apply(p, x)).lower(params, x).as_text()
        assert "collective_permute" not in txt_plain

        with ring_context(mesh, batch_axes=("dp",)):
            ring_fn = jax.jit(lambda p, x: attn.apply(p, x))
            txt_ring = ring_fn.lower(params, x).as_text()
            out_r = ring_fn(params, x)
        assert "collective_permute" in txt_ring
        out_e = attn.apply(params, x)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_e),
                                   atol=1e-5, rtol=1e-5)

    def test_auto_stays_einsum_when_sp_is_one(self):
        from ezaudio_tpu.models.blocks import Attention

        mesh = make_mesh(dp=4, sp=1, devices=jax.devices()[:4])
        B, L, D = 2, 16, 32
        x = jax.random.normal(jax.random.PRNGKey(23), (B, L, D))
        attn = Attention(dim=D, num_heads=4)
        params = attn.init(jax.random.PRNGKey(24), x)
        with ring_context(mesh, batch_axes=("dp",)):
            txt = jax.jit(lambda p, x: attn.apply(p, x)).lower(
                params, x).as_text()
        assert "collective_permute" not in txt
