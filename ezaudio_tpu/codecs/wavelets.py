"""Multi-level 1D discrete wavelet transform (DWT) pretransform.

The reference's ``WaveletPretransform`` (stable_vae/models/pretransforms.py:92)
imports a ``wavelets`` module that does not exist in its tree — the feature
is declared but dead upstream.  This is a working TPU-native version:

  * Daubechies filters are constructed from scratch by spectral
    factorization of the Daubechies half-band polynomial (no PyWavelets);
  * each level is a grouped strided ``lax`` conv with periodic (circular)
    extension — orthogonal-wavelet reconstruction is exact to float
    precision ("periodization" mode);
  * layout is channel-last: (B, T, C) <-> (B, T/2^L, C*2^L) — the subband
    axis lands on the lane dimension, where the MXU wants it.

Conventions: analysis is CORRELATION with the filter
(``y_lo[n] = sum_k h_lo[k] x[(2n+k) mod T]``), synthesis is true
CONVOLUTION with the same filters (the orthogonal inverse).
"""

from __future__ import annotations

from math import comb
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def daubechies_filters(order: int) -> Tuple[np.ndarray, np.ndarray]:
    """Daubechies ``dbN`` filters (lo, hi), 2N taps, by spectral
    factorization: the remainder polynomial R(y) of the half-band product
    filter has its roots split min-phase (|z| < 1); together with the
    (1+z)^N binomial factor this is the standard Daubechies filter.
    db1 == Haar."""
    if order == 1:
        lo = np.array([1.0, 1.0]) / np.sqrt(2.0)
    else:
        N = order
        r = np.array([comb(N - 1 + i, i) for i in range(N)], np.float64)
        # R(y) with y = (2 - z - 1/z)/4, as a Laurent polynomial in z
        y_poly = np.array([-0.25, 0.5, -0.25])
        acc = np.zeros(2 * N - 1)
        acc[N - 1] = r[0]
        cur = np.array([1.0])
        for i in range(1, N):
            cur = np.convolve(cur, y_poly)
            off = (2 * N - 1 - cur.size) // 2
            acc[off : off + cur.size] += r[i] * cur
        roots = np.roots(acc)
        q = np.array([1.0])
        for rt in roots[np.abs(roots) < 1.0]:
            q = np.convolve(q, np.array([1.0, -rt]))
        q = np.real(q)
        b = np.array([1.0])
        for _ in range(N):
            b = np.convolve(b, np.array([1.0, 1.0]))
        lo = np.convolve(b, q)
        lo = lo / lo.sum() * np.sqrt(2.0)
    hi = lo[::-1].copy()
    hi[1::2] *= -1.0  # quadrature mirror
    return lo.astype(np.float64), hi.astype(np.float64)


_NAMED = {"haar": 1, **{f"db{i}": i for i in range(1, 9)}}


def wavelet_filters(name: str) -> Tuple[np.ndarray, np.ndarray]:
    if name not in _NAMED:
        raise ValueError(f"unsupported wavelet '{name}' "
                         f"(supported: {sorted(_NAMED)})")
    return daubechies_filters(_NAMED[name])


def _analysis_step(x: jnp.ndarray, lo: np.ndarray, hi: np.ndarray
                   ) -> jnp.ndarray:
    """(B, T, C) -> (B, T/2, 2C).  Output channel 2c = approx of input
    channel c, 2c+1 = detail (grouped conv keeps subbands adjacent)."""
    B, T, C = x.shape
    k = lo.shape[0]
    xp = jnp.concatenate([x, x[:, : k - 1, :]], axis=1)  # circular
    # grouped kernel (k, in_per_group=1, out=2C): correlation with h
    kern = jnp.stack([jnp.asarray(lo), jnp.asarray(hi)], axis=1)  # (k, 2)
    kd = jnp.tile(kern[:, None, :], (1, 1, C)).astype(x.dtype)   # (k,1,2C)
    return jax.lax.conv_general_dilated(
        xp, kd, window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C)


def _synthesis_step(y: jnp.ndarray, lo: np.ndarray, hi: np.ndarray
                    ) -> jnp.ndarray:
    """(B, T/2, 2C) -> (B, T, C): x[m] = sum_n lo[m-2n] y_lo[n] +
    hi[m-2n] y_hi[n], circularly."""
    B, Th, C2 = y.shape
    C = C2 // 2
    k = lo.shape[0]
    T = 2 * Th
    # upsample by 2
    u = jnp.zeros((B, T, C2), y.dtype).at[:, ::2, :].set(y)
    # true convolution = correlation with the reversed filters; grouped so
    # input channels (2c, 2c+1) -> output channel c
    kern = jnp.stack([jnp.asarray(lo[::-1].copy()),
                      jnp.asarray(hi[::-1].copy())], axis=1)  # (k, 2)
    kd = jnp.tile(kern[:, :, None], (1, 1, C)).astype(y.dtype)  # (k, 2, C)
    out = jax.lax.conv_general_dilated(
        u, kd, window_strides=(1,), padding=[(k - 1, k - 1)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C)
    # out has length T + k - 1; fold the acausal tail circularly
    body = out[:, :T, :]
    tail = out[:, T:, :]
    if k > 1:
        pad = jnp.zeros((B, T - tail.shape[1], C), out.dtype)
        body = body + jnp.concatenate([tail, pad], axis=1)
    return body


class WaveletEncode1d:
    """levels-deep DWT: (B, T, channels) -> (B, T/2^L, channels*2^L)."""

    def __init__(self, channels: int, levels: int, wavelet: str = "db4"):
        self.channels = channels
        self.levels = levels
        self.lo, self.hi = wavelet_filters(wavelet)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = len(self.lo)
        for lvl in range(self.levels):
            assert x.shape[1] % 2 == 0, (
                f"time axis {x.shape[1]} must be divisible by 2 per level")
            if x.shape[1] < k:
                # a shorter axis under-fills the circular extension
                # (silently wrong shapes here; negative-size zeros in the
                # synthesis tail fold)
                raise ValueError(
                    f"time axis {x.shape[1]} at level {lvl} is shorter than "
                    f"the {k}-tap wavelet; use fewer levels or a shorter "
                    f"wavelet")
            x = _analysis_step(x, self.lo, self.hi)
        return x


class WaveletDecode1d:
    def __init__(self, channels: int, levels: int, wavelet: str = "db4"):
        self.channels = channels
        self.levels = levels
        self.lo, self.hi = wavelet_filters(wavelet)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        k = len(self.lo)
        for lvl in range(self.levels):
            if 2 * z.shape[1] < k:
                raise ValueError(
                    f"time axis {z.shape[1]} at level {lvl} is too short "
                    f"for the {k}-tap wavelet; use fewer levels or a "
                    f"shorter wavelet")
            z = _synthesis_step(z, self.lo, self.hi)
        return z
