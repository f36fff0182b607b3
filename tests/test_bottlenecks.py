"""Bottleneck zoo tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.codecs.bottlenecks import (
    FSQBottleneck, L2Bottleneck, RVQBottleneck, TanhBottleneck,
    WassersteinBottleneck, make_bottleneck)


def test_tanh_and_l2(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32)) * 3
    t, _ = TanhBottleneck().encode(x)
    assert float(jnp.abs(t).max()) <= 1.0
    l2 = L2Bottleneck()
    z, _ = l2.encode(x)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(z, axis=-1)), 1.0,
                               atol=1e-5)


def test_wasserstein_mmd_small_for_gaussian(rng):
    w = WassersteinBottleneck()
    gauss = jnp.asarray(rng.standard_normal((1, 256, 8)).astype(np.float32))
    _, info = w.encode(gauss, key=jax.random.PRNGKey(0), return_info=True)
    mmd_g = float(info["mmd"])
    shifted = gauss + 3.0
    _, info2 = w.encode(shifted, key=jax.random.PRNGKey(0), return_info=True)
    assert mmd_g < float(info2["mmd"])


def test_rvq_bottleneck(rng):
    m = RVQBottleneck(input_dim=8, n_codebooks=2, codebook_size=16, codebook_dim=4)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, method=lambda mm, xx: mm.encode(xx))
    zq, info = m.apply(variables, x, method=lambda mm, xx: mm.encode(xx))
    assert zq.shape == x.shape
    assert info["codes"].shape == (2, 2, 10)
    dec = m.apply(variables, info["codes"],
                  method=lambda mm, c: mm.decode_tokens(c))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(zq), atol=1e-5)


def test_fsq_roundtrip(rng):
    m = FSQBottleneck(levels=(8, 5, 5, 5))
    x = jnp.asarray(rng.standard_normal((2, 12, 4)).astype(np.float32)) * 2
    out, info = m.encode(x)
    assert out.shape == x.shape
    assert float(jnp.abs(out).max()) <= 1.0
    rec = m.decode_tokens(info["codes"])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(out), atol=1e-6)
    # tokens in range prod(levels)
    assert int(info["codes"].max()) < 8 * 5 * 5 * 5


def test_factory():
    assert isinstance(make_bottleneck("tanh"), TanhBottleneck)
    assert isinstance(make_bottleneck("fsq", levels=(4, 4)), FSQBottleneck)


class TestFSQBinaryLevel:
    def test_binary_channel_not_collapsed(self):
        """levels containing 2 used to produce arctanh(1)=inf shift,
        pinning the channel to one constant code."""
        import jax.numpy as jnp

        from ezaudio_tpu.codecs.bottlenecks import FSQBottleneck

        fsq = FSQBottleneck(levels=(8, 5, 2))
        z = jnp.asarray(np.stack([np.full((4, 3), -3.0),
                                  np.full((4, 3), 3.0)]), jnp.float32)
        b = np.asarray(fsq._bound(z))
        assert np.isfinite(b).all()
        # the binary channel must distinguish strongly negative vs
        # strongly positive inputs
        codes_neg = np.round(b[0, :, 2])
        codes_pos = np.round(b[1, :, 2])
        assert not np.array_equal(codes_neg, codes_pos)
