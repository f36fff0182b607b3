"""Multi-scale GAN discriminators for codec training.

Behavioral parity with reference ``src/modules/dac/model/discriminator.py``:
  * MPD — multi-period (2D convs over a period-folded waveform view);
  * MSD — multi-scale 1D convs over resampled audio;
  * MRD — complex multi-band spectrogram discriminator (2D convs over
    real/imag STFT bands);
  * combined ``Discriminator`` with DC removal + 0.8 peak normalization.

And ``GANLoss`` (dac/nn/loss.py:330-368): least-squares adversarial losses
and L1 feature matching over all but the final feature map.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ezaudio_tpu.audio.stft import stft
from ezaudio_tpu.ops.convs import Conv1d, Conv2d

BANDS = [(0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]


def leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


class MPD(nn.Module):
    period: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T, 1) -> list of feature maps."""
        B, T, _ = x.shape
        pad = (self.period - T % self.period) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        L = x.shape[1] // self.period
        h = x.reshape(B, L, self.period, 1)  # (B, l, p, C)

        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (ci, co) in enumerate(chans):
            h = Conv2d(ci, co, (5, 1), (3, 1), padding=(2, 0), weight_norm=True,
                       dtype=self.dtype, name=f"conv{i}")(h)
            h = leaky(h)
            fmap.append(h)
        h = Conv2d(1024, 1024, (5, 1), (1, 1), padding=(2, 0), weight_norm=True,
                   dtype=self.dtype, name="conv4")(h)
        h = leaky(h)
        fmap.append(h)
        h = Conv2d(1024, 1, (3, 1), (1, 1), padding=(1, 0), weight_norm=True,
                   dtype=self.dtype, name="conv_post")(h)
        fmap.append(h)
        return fmap


class MSD(nn.Module):
    rate: int = 1
    sample_rate: int = 44100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T, 1); resampling by ``rate`` happens host-side before the
        call when rate > 1 (the jitted graph stays resampler-free)."""
        h = x
        fmap = []
        specs = [(1, 16, 15, 1, 1, 7), (16, 64, 41, 4, 4, 20),
                 (64, 256, 41, 4, 16, 20), (256, 1024, 41, 4, 64, 20),
                 (1024, 1024, 41, 4, 256, 20), (1024, 1024, 5, 1, 1, 2)]
        for i, (ci, co, k, s, g, p) in enumerate(specs):
            h = Conv1d(ci, co, k, stride=s, groups=g, padding=p,
                       weight_norm=True, dtype=self.dtype, name=f"conv{i}")(h)
            h = leaky(h)
            fmap.append(h)
        h = Conv1d(1024, 1, 3, padding=1, weight_norm=True, dtype=self.dtype,
                   name="conv_post")(h)
        fmap.append(h)
        return fmap


class MRD(nn.Module):
    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T, 1)."""
        n_fft = self.window_length // 2 + 1
        hop = int(self.window_length * self.hop_factor)
        spec = stft(x[..., 0], self.window_length, hop)  # (B, F, T')
        h_all = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, F, T', 2)
        h_all = h_all.transpose(0, 2, 1, 3)  # (B, T', F, 2)
        bands = [(int(lo * n_fft), int(hi * n_fft)) for lo, hi in self.bands]

        fmap = []
        outs = []
        ch = 32
        for bi, (lo, hi) in enumerate(bands):
            h = h_all[:, :, lo:hi, :]
            specs = [(2, ch, (3, 9), (1, 1), (1, 4)),
                     (ch, ch, (3, 9), (1, 2), (1, 4)),
                     (ch, ch, (3, 9), (1, 2), (1, 4)),
                     (ch, ch, (3, 9), (1, 2), (1, 4)),
                     (ch, ch, (3, 3), (1, 1), (1, 1))]
            for li, (ci, co, k, s, p) in enumerate(specs):
                h = Conv2d(ci, co, k, s, padding=p, weight_norm=True,
                           dtype=self.dtype, name=f"band{bi}_conv{li}")(h)
                h = leaky(h)
                fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)
        h = Conv2d(ch, 1, (3, 3), (1, 1), padding=(1, 1), weight_norm=True,
                   dtype=self.dtype, name="conv_post")(h)
        fmap.append(h)
        return fmap


class Discriminator(nn.Module):
    rates: Sequence[int] = ()
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T, 1) -> list (per sub-discriminator) of lists of fmaps."""
        x = x - x.mean(axis=1, keepdims=True)
        x = 0.8 * x / (jnp.abs(x).max(axis=1, keepdims=True) + 1e-9)
        outs = []
        for p in self.periods:
            outs.append(MPD(p, dtype=self.dtype, name=f"mpd_{p}")(x))
        for r in self.rates:
            # host-free approximation: strided subsample for rate>1
            xr = x[:, ::r] if r > 1 else x
            outs.append(MSD(r, self.sample_rate, dtype=self.dtype,
                            name=f"msd_{r}")(xr))
        for f in self.fft_sizes:
            outs.append(MRD(f, sample_rate=self.sample_rate, bands=self.bands,
                            dtype=self.dtype, name=f"mrd_{f}")(x))
        return outs


# ---------------------------------------------------------------------------
# GAN losses (least-squares + feature matching)
# ---------------------------------------------------------------------------

def discriminator_loss(d_fake: List[List[jnp.ndarray]],
                       d_real: List[List[jnp.ndarray]]) -> jnp.ndarray:
    loss = 0.0
    for f, r in zip(d_fake, d_real):
        loss = loss + jnp.mean(jnp.square(f[-1]))
        loss = loss + jnp.mean(jnp.square(1.0 - r[-1]))
    return loss


def generator_loss(d_fake: List[List[jnp.ndarray]],
                   d_real: List[List[jnp.ndarray]]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    loss_g = 0.0
    for f in d_fake:
        loss_g = loss_g + jnp.mean(jnp.square(1.0 - f[-1]))
    loss_feat = 0.0
    for f, r in zip(d_fake, d_real):
        for j in range(len(f) - 1):
            loss_feat = loss_feat + jnp.mean(
                jnp.abs(f[j] - jax.lax.stop_gradient(r[j])))
    return loss_g, loss_feat
