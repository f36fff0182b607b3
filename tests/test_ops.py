"""Unit tests for neural primitives against PyTorch ground truth.

torch (CPU) is available in the image, so every primitive with a torch
counterpart is checked numerically against it — this is how we guarantee
behavioral parity with the reference without porting its code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ezaudio_tpu.ops import activations as act
from ezaudio_tpu.ops.attention import dot_product_attention
from ezaudio_tpu.ops.convs import Conv1d, ConvTranspose1d
from ezaudio_tpu.ops.embeddings import timestep_embedding
from ezaudio_tpu.ops.norms import LayerNorm, RMSNorm
from ezaudio_tpu.ops.rope import apply_rope, rope_tables


def t2j(x):
    return jnp.asarray(x.detach().numpy())


class TestActivations:
    def test_gelu_exact(self, rng):
        x = rng.standard_normal((4, 33)).astype(np.float32)
        got = np.asarray(act.gelu(jnp.asarray(x)))
        want = F.gelu(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_gelu_tanh(self, rng):
        x = rng.standard_normal((4, 33)).astype(np.float32)
        got = np.asarray(act.gelu_tanh(jnp.asarray(x)))
        want = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
        # XLA and torch tanh differ at the ULP level; 5e-5 absolute is the
        # expected cross-library transcendental tolerance at float32.
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_geglu(self, rng):
        x = rng.standard_normal((2, 5, 64)).astype(np.float32)
        got = np.asarray(act.geglu(jnp.asarray(x)))
        a, b = torch.from_numpy(x).chunk(2, dim=-1)
        want = (a * F.gelu(b)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_snake_beta_vae(self, rng):
        # VAE snake: x + (1/(beta+1e-9)) sin(alpha x)^2 with exp'd params
        x = rng.standard_normal((2, 7, 16)).astype(np.float32)
        log_alpha = rng.standard_normal(16).astype(np.float32) * 0.1
        log_beta = rng.standard_normal(16).astype(np.float32) * 0.1
        alpha, beta = np.exp(log_alpha), np.exp(log_beta)
        got = np.asarray(act.snake_beta_vae(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta)))
        xt = torch.from_numpy(x)
        at = torch.from_numpy(alpha)
        bt = torch.from_numpy(beta)
        want = (xt + (1.0 / (bt + 1e-9)) * torch.sin(xt * at).pow(2)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestNorms:
    def test_layernorm_matches_torch(self, rng):
        x = rng.standard_normal((3, 7, 32)).astype(np.float32)
        w = rng.standard_normal(32).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        ln = LayerNorm(dim=32)
        out = ln.apply({"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        want = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)

    def test_rmsnorm_matches_reference_formula(self, rng):
        x = rng.standard_normal((3, 7, 32)).astype(np.float32)
        w = rng.standard_normal(32).astype(np.float32)
        m = RMSNorm(dim=32)
        out = m.apply({"params": {"weight": jnp.asarray(w)}}, jnp.asarray(x))
        xt = torch.from_numpy(x)
        want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.from_numpy(w)).numpy()
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


class TestRoPE:
    def test_tables_match_reference_construction(self):
        # reference rotary.py: inv_freq = 1/10000^(2i/d); emb = cat([freqs, freqs])
        L, D = 12, 8
        cos, sin = rope_tables(L, D)
        inv_freq = 1.0 / (10000 ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(L).float()
        freqs = torch.einsum("i,j->ij", t, inv_freq)
        emb = torch.cat((freqs, freqs), dim=-1)
        np.testing.assert_allclose(np.asarray(cos), emb.cos().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), emb.sin().numpy(), atol=1e-5)

    def test_apply_matches_torch_rotate_half(self, rng):
        B, H, L, D = 2, 3, 10, 8
        x = rng.standard_normal((B, H, L, D)).astype(np.float32)
        cos, sin = rope_tables(L, D)
        got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

        xt = torch.from_numpy(x)
        cos_t = torch.from_numpy(np.asarray(cos))[None, None]
        sin_t = torch.from_numpy(np.asarray(sin))[None, None]
        x1, x2 = xt.chunk(2, dim=-1)
        rot = torch.cat((-x2, x1), dim=-1)
        want = (xt * cos_t + rot * sin_t).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAttention:
    def test_sdpa_parity(self, rng):
        B, H, L, D = 2, 4, 9, 16
        q = rng.standard_normal((B, H, L, D)).astype(np.float32)
        k = rng.standard_normal((B, H, L, D)).astype(np.float32)
        v = rng.standard_normal((B, H, L, D)).astype(np.float32)
        got = np.asarray(dot_product_attention(*map(jnp.asarray, (q, k, v))))
        want = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_masked_sdpa_parity(self, rng):
        B, H, Lq, Lk, D = 2, 2, 5, 7, 8
        q = rng.standard_normal((B, H, Lq, D)).astype(np.float32)
        k = rng.standard_normal((B, H, Lk, D)).astype(np.float32)
        v = rng.standard_normal((B, H, Lk, D)).astype(np.float32)
        kmask = rng.random((B, Lk)) > 0.3
        mask4 = kmask[:, None, None, :]
        got = np.asarray(
            dot_product_attention(*map(jnp.asarray, (q, k, v)), mask=jnp.asarray(mask4))
        )
        want = F.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=torch.from_numpy(mask4),
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConvs:
    @pytest.mark.parametrize("k,s,p,d", [(7, 1, 3, 1), (7, 1, 9, 3), (4, 2, 1, 1), (20, 10, 5, 1), (1, 1, 0, 1)])
    def test_conv1d_parity(self, rng, k, s, p, d):
        Cin, Cout, T = 5, 6, 40
        x = rng.standard_normal((2, T, Cin)).astype(np.float32)
        tconv = torch.nn.Conv1d(Cin, Cout, k, stride=s, padding=p, dilation=d)
        want = tconv(torch.from_numpy(x).transpose(1, 2)).detach().numpy().transpose(0, 2, 1)

        m = Conv1d(in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s, padding=p, dilation=d)
        params = {
            "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 1, 0)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("k,s,p", [(4, 2, 1), (8, 4, 2), (12, 6, 3), (20, 10, 5), (10, 5, 0), (10, 5, 3), (6, 3, 2)])
    def test_conv_transpose1d_parity(self, rng, k, s, p):
        Cin, Cout, T = 5, 6, 13
        x = rng.standard_normal((2, T, Cin)).astype(np.float32)
        tconv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p)
        want = tconv(torch.from_numpy(x).transpose(1, 2)).detach().numpy().transpose(0, 2, 1)

        m = ConvTranspose1d(in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s, padding=p)
        w = tconv.weight.detach().numpy()  # (in, out, k)
        kernel = w.transpose(2, 0, 1)[::-1].copy()  # (k, in, out), time-flipped
        params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("k,s,p", [(4, 2, 1), (8, 4, 2), (12, 6, 3), (20, 10, 5), (10, 5, 0), (10, 5, 3), (6, 3, 2)])
    def test_conv_transpose1d_polyphase_matches_lax(self, rng, k, s, p, monkeypatch):
        """The polyphase dense-matmul fast path (ops/convs.py, probe13)
        must be numerically identical to the lhs_dilation lax lowering."""
        Cin, Cout, T = 5, 6, 13
        x = jnp.asarray(rng.standard_normal((2, T, Cin)).astype(np.float32))
        m = ConvTranspose1d(in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s, padding=p)
        variables = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("EZAUDIO_CONVT_IMPL", "lax")
        want = np.asarray(m.apply(variables, x))
        monkeypatch.setenv("EZAUDIO_CONVT_IMPL", "polyphase")
        got = np.asarray(m.apply(variables, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_weight_norm_conv_parity(self, rng):
        Cin, Cout, T, k = 4, 8, 20, 7
        x = rng.standard_normal((1, T, Cin)).astype(np.float32)
        tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(Cin, Cout, k, padding=3))
        want = tconv(torch.from_numpy(x).transpose(1, 2)).detach().numpy().transpose(0, 2, 1)

        v = tconv.weight_v.detach().numpy().transpose(2, 1, 0)  # (k, in, out)
        g = tconv.weight_g.detach().numpy().reshape(-1)  # (out,)
        m = Conv1d(in_channels=Cin, out_channels=Cout, kernel_size=k, padding=3, weight_norm=True)
        params = {"v": jnp.asarray(v), "g": jnp.asarray(g), "bias": jnp.asarray(tconv.bias.detach().numpy())}
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_weight_norm_conv_transpose_parity(self, rng):
        Cin, Cout, T, k, s, p = 6, 4, 9, 12, 6, 3
        x = rng.standard_normal((1, T, Cin)).astype(np.float32)
        tconv = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p))
        want = tconv(torch.from_numpy(x).transpose(1, 2)).detach().numpy().transpose(0, 2, 1)

        v = tconv.weight_v.detach().numpy().transpose(2, 0, 1)[::-1].copy()  # (k, in, out) flipped
        g = tconv.weight_g.detach().numpy().reshape(-1)  # (in,)
        m = ConvTranspose1d(in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s, padding=p, weight_norm=True)
        params = {"v": jnp.asarray(v), "g": jnp.asarray(g), "bias": jnp.asarray(tconv.bias.detach().numpy())}
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestTimestepEmbedding:
    def test_matches_reference_formula(self):
        # modules.py:19-37 — cos first then sin
        import math

        t = torch.tensor([0.0, 1.0, 500.0, 999.0])
        dim = 256
        half = dim // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = t[:, None] * freqs[None]
        want = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
        got = np.asarray(timestep_embedding(jnp.asarray(t.numpy()), dim))
        # cos/sin of arguments up to ~1000 rad: XLA's float32 range reduction
        # differs from torch's at the 1e-3 level on the highest-frequency
        # components (pure phase noise, far below the fp16 AMP precision the
        # reference trains with).
        np.testing.assert_allclose(got, want, atol=5e-3)
        # small arguments (t=0,1) are exact
        np.testing.assert_allclose(got[:2], want[:2], atol=1e-5)


class TestPatchify2D:
    def test_roundtrip(self, rng):
        import jax.numpy as jnp

        from ezaudio_tpu.ops.embeddings import patchify_2d, unpatchify_2d

        x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
        p = patchify_2d(jnp.asarray(x), 4)
        assert p.shape == (2, 2 * 3, 4 * 4 * 3)
        rec = unpatchify_2d(p, 3, (8, 12))
        np.testing.assert_array_equal(np.asarray(rec), x)

    def test_matches_torch_conv_patch_embed(self, rng):
        """PatchEmbed2D == torch Conv2d(stride=patch) + flatten, as in the
        reference 2d path (modules.py:88-111)."""
        import jax
        import jax.numpy as jnp

        from ezaudio_tpu.ops.embeddings import PatchEmbed2D

        B, H, W, C, p, D = 2, 8, 8, 3, 4, 16
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        conv = torch.nn.Conv2d(C, D, kernel_size=p, stride=p)
        want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = want.flatten(2).transpose(1, 2).detach().numpy()  # (B, L, D)

        m = PatchEmbed2D(patch_size=p, in_chans=C, embed_dim=D)
        # torch conv weight (D, C, p, p) -> our (p*p*C, D) with
        # patch-major (row, col, channel) packing
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(p * p * C, D)
        params = {"kernel": jnp.asarray(w),
                  "bias": jnp.asarray(conv.bias.detach().numpy())}
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFlashAttentionWrapper:
    def test_cpu_fallback_matches_einsum(self, rng):
        from ezaudio_tpu.ops.attention import (
            dot_product_attention, flash_attention_tpu)

        q = jnp.asarray(rng.standard_normal((2, 4, 500, 72)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 4, 500, 72)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 4, 500, 72)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 500)) > 0.2)
        want = dot_product_attention(q, k, v, mask=mask[:, None, None, :])
        got = flash_attention_tpu(q, k, v, key_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_flash_impl_selected_in_blocks(self, rng):
        """attention_impl='flash' routes self-attn through the wrapper and
        produces the same result as einsum on CPU (fallback path)."""
        from ezaudio_tpu.models.blocks import Attention

        x = jnp.asarray(rng.standard_normal((2, 300, 64)).astype(np.float32))
        attn = Attention(dim=64, num_heads=4, rope_mode="shared",
                         attention_impl="einsum")
        p = attn.init(jax.random.PRNGKey(0), x)
        want = attn.apply(p, x)
        attn_f = Attention(dim=64, num_heads=4, rope_mode="shared",
                           attention_impl="flash")
        got = attn_f.apply(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestBatchScalingAttentionVariants:
    """bf16-softmax and query-chunked einsum attention (VERDICT r2 item 5)
    must match the default einsum path."""

    def _qkv(self, rng, B=2, H=4, Lq=37, Lk=50, D=16):
        import jax.numpy as jnp

        q = jnp.asarray(rng.standard_normal((B, H, Lq, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, Lk, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, Lk, D)), jnp.float32)
        return q, k, v

    def test_chunked_matches_einsum_exactly(self, rng):
        from ezaudio_tpu.ops.attention import (
            chunked_dot_product_attention, dot_product_attention)

        q, k, v = self._qkv(rng)
        ref = dot_product_attention(q, k, v)
        out = chunked_dot_product_attention(q, k, v, q_chunk=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_chunked_with_key_mask(self, rng):
        import jax.numpy as jnp

        from ezaudio_tpu.ops.attention import (
            chunked_dot_product_attention, dot_product_attention)

        q, k, v = self._qkv(rng)
        km = jnp.asarray(rng.random((2, 50)) > 0.3)
        mask = km[:, None, None, :]
        ref = dot_product_attention(q, k, v, mask=mask)
        out = chunked_dot_product_attention(q, k, v, mask=mask, q_chunk=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_bf16_softmax_close_to_f32(self, rng):
        import jax.numpy as jnp

        from ezaudio_tpu.ops.attention import dot_product_attention

        q, k, v = self._qkv(rng)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ref = np.asarray(dot_product_attention(q, k, v), np.float32)
        out = np.asarray(dot_product_attention(
            q, k, v, softmax_dtype=jnp.bfloat16), np.float32)
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel

    def test_impls_selected_in_blocks(self, rng):
        """The EZAUDIO_ATTN_IMPL trace-time switch must route to the
        variants and produce outputs close to einsum at model level."""
        import os

        import jax
        import jax.numpy as jnp

        from ezaudio_tpu.models.blocks import Attention

        x = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
        outs = {}
        for impl in ("einsum", "chunked", "bf16", "chunked_bf16"):
            os.environ["EZAUDIO_ATTN_IMPL"] = impl
            try:
                attn = Attention(dim=32, num_heads=4, rope_mode="none",
                                 attention_impl="auto")
                p = attn.init(jax.random.PRNGKey(0), x)
                outs[impl] = np.asarray(attn.apply(p, x), np.float32)
            finally:
                os.environ.pop("EZAUDIO_ATTN_IMPL", None)
        np.testing.assert_allclose(outs["chunked"], outs["einsum"],
                                   atol=1e-5)
        for impl in ("bf16", "chunked_bf16"):
            rel = (np.abs(outs[impl] - outs["einsum"]).max()
                   / (np.abs(outs["einsum"]).max() + 1e-9))
            assert rel < 0.05, (impl, rel)
