"""Audio loss / quality metric library.

Equivalents of the reference's metric stack (audiotools/metrics/):
  * ``multiscale_stft_loss``  — MultiScaleSTFTLoss (spectral.py:11-95):
    sum over window lengths of log-magnitude L1 (clamped at 1e-5, x
    log-weight) + magnitude L1;
  * ``mel_spectrogram_loss``  — MelSpectrogramLoss (spectral.py:98-193):
    same decomposition on mel spectrograms over multiple scales;
  * ``si_sdr``                — SISDRLoss (distance.py:45-126);
  * ``l1_loss``               — plain waveform L1;
  * ``stft_phase_loss``       — PhaseLoss (spectral.py:195-239).

All functions take (B, T) waveforms, run under jit, and return scalars
(or per-item vectors with ``reduce=False`` where noted).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ezaudio_tpu.audio.stft import mel_spectrogram, stft


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def si_sdr(estimate: jnp.ndarray, reference: jnp.ndarray,
           scaling: bool = True, zero_mean: bool = True,
           reduce: bool = True) -> jnp.ndarray:
    """Scale-invariant SDR in dB (higher is better).  Matches the
    audiotools SISDRLoss math (distance.py:75-118) without its sign flip."""
    eps = 1e-8
    if zero_mean:
        estimate = estimate - estimate.mean(axis=-1, keepdims=True)
        reference = reference - reference.mean(axis=-1, keepdims=True)
    if scaling:
        alpha = (jnp.sum(estimate * reference, axis=-1, keepdims=True) + eps) / (
            jnp.sum(reference**2, axis=-1, keepdims=True) + eps)
    else:
        alpha = 1.0
    e_true = alpha * reference
    e_res = estimate - e_true
    sdr = 10 * jnp.log10(
        (jnp.sum(e_true**2, axis=-1) + eps) / (jnp.sum(e_res**2, axis=-1) + eps))
    return sdr.mean() if reduce else sdr


def _stft_mag(x, n_fft, hop):
    return jnp.abs(stft(x, n_fft, hop))


def multiscale_stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
) -> jnp.ndarray:
    """Multi-scale STFT loss (audiotools defaults: windows 2048/512,
    hop = window/4, log-clamped-magnitude^pow L1 + magnitude L1)."""
    loss = 0.0
    for w in window_lengths:
        mx = _stft_mag(pred, w, w // 4)
        my = _stft_mag(target, w, w // 4)
        logx = jnp.log10(jnp.maximum(mx, clamp_eps) ** pow)
        logy = jnp.log10(jnp.maximum(my, clamp_eps) ** pow)
        loss = loss + log_weight * jnp.mean(jnp.abs(logx - logy))
        loss = loss + mag_weight * jnp.mean(jnp.abs(mx - my))
    return loss


def mel_spectrogram_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    sr: int = 24000,
    n_mels: Sequence[int] = (150, 80),
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
    fmin: Sequence[float] = (0.0, 0.0),
    fmax: Optional[Sequence[Optional[float]]] = None,
) -> jnp.ndarray:
    """Multi-scale mel loss (audiotools spectral.py:98-193 defaults)."""
    fmax = fmax or [None] * len(n_mels)
    if len(fmin) != len(n_mels):
        if len(fmin) == 1:  # broadcast a single value across scales
            fmin = tuple(fmin) * len(n_mels)
        elif tuple(fmin) == (0.0, 0.0):  # the untouched length-2 default
            fmin = (0.0,) * len(n_mels)
        # else: a user-supplied fmin of the wrong length falls through to
        # the alignment check below instead of being silently replaced
    if len({len(n_mels), len(window_lengths), len(fmin), len(fmax)}) != 1:
        raise ValueError(
            f"scale lists must align: n_mels {len(n_mels)}, windows "
            f"{len(window_lengths)}, fmin {len(fmin)}, fmax {len(fmax)}")
    loss = 0.0
    for nm, w, lo, hi in zip(n_mels, window_lengths, fmin, fmax):
        mx = mel_spectrogram(pred, sr, w, w // 4, nm, lo, hi)
        my = mel_spectrogram(target, sr, w, w // 4, nm, lo, hi)
        logx = jnp.log10(jnp.maximum(mx, clamp_eps) ** pow)
        logy = jnp.log10(jnp.maximum(my, clamp_eps) ** pow)
        loss = loss + log_weight * jnp.mean(jnp.abs(logx - logy))
        loss = loss + mag_weight * jnp.mean(jnp.abs(mx - my))
    return loss


def stft_phase_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    window_lengths: Sequence[int] = (2048, 512),
                    weight: float = 1.0) -> jnp.ndarray:
    """Phase distance weighted by reference magnitude (spectral.py:195-239)."""
    loss = 0.0
    for w in window_lengths:
        sx = stft(pred, w, w // 4)
        sy = stft(target, w, w // 4)
        d = jnp.angle(sx) - jnp.angle(sy)
        # wrap to [-pi, pi]
        d = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
        mag = jnp.abs(sy)
        loss = loss + weight * jnp.mean(mag * d**2) / jnp.maximum(jnp.mean(mag), 1e-8)
    return loss


# ---------------------------------------------------------------------------
# Frechet distance (FAD math; plug in any embedding model)
# ---------------------------------------------------------------------------

def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """Frechet distance between two Gaussians (the FAD/FD statistic,
    Kilgour et al., arXiv 1812.08466).  Host-side numpy/scipy."""
    import numpy as np
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    cov1, cov2 = np.asarray(cov1), np.asarray(cov2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        # rank-deficient covariances (e.g. fewer clips than embedding
        # dims): retry with the standard eps*I offset every reference
        # FID/FAD implementation uses
        eps = 1e-6
        off = np.eye(cov1.shape[0]) * eps
        covmean, _ = linalg.sqrtm((cov1 + off) @ (cov2 + off), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(covmean))


def _gaussian_stats(emb):
    import numpy as np

    emb = np.asarray(emb, np.float64)
    mu = emb.mean(axis=0)
    cov = np.cov(emb, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_audio_distance(emb_eval, emb_ref) -> float:
    """FAD over two sets of per-clip embeddings (N, D).

    The canonical metric uses VGGish embeddings (external weights); any
    embedding function works — see ``mel_statistics_embedding`` for a
    dependency-free proxy useful for regression tracking."""
    mu1, cov1 = _gaussian_stats(emb_eval)
    mu2, cov2 = _gaussian_stats(emb_ref)
    return frechet_distance(mu1, cov1, mu2, cov2)


def mel_statistics_embedding(wavs, sr: int, n_mels: int = 64,
                             n_fft: int = 1024) -> jnp.ndarray:
    """A lightweight per-clip embedding: log-mel mean/std/delta-mean per
    band -> (N, 3*n_mels).  Not VGGish — a proxy for fixture-free FAD-style
    regression tests and training monitoring."""
    m = mel_spectrogram(jnp.asarray(wavs), sr, n_fft, n_fft // 4, n_mels)
    logm = jnp.log(jnp.maximum(m, 1e-5))
    mean = logm.mean(axis=-1)
    std = logm.std(axis=-1)
    dmean = jnp.abs(jnp.diff(logm, axis=-1)).mean(axis=-1)
    return jnp.concatenate([mean, std, dmean], axis=-1)


# ---------------------------------------------------------------------------
# Classifier-based generative metrics (the paper's KL / IS columns)
# ---------------------------------------------------------------------------

def paired_kl_divergence(logits_eval, logits_ref, kind: str = "softmax"
                         ) -> float:
    """Paired KL divergence between classifier logits of generated and
    reference clips — the "KL" column of the EzAudio paper's tables
    (audioldm_eval convention: per-pair KL(p_ref || p_gen), averaged).

    ``kind='softmax'`` treats logits as one multiclass distribution per
    clip; ``kind='sigmoid'`` as independent per-class Bernoullis (both are
    reported by audioldm_eval).  Classifier-agnostic: feed logits from any
    tagger (e.g. a PANNs-style CNN14 given local weights).
    """
    import numpy as np

    le = np.asarray(logits_eval, np.float64)
    lr = np.asarray(logits_ref, np.float64)
    if le.shape != lr.shape:
        raise ValueError(f"paired metric needs matching shapes, got "
                         f"{le.shape} vs {lr.shape}")
    if kind == "softmax":
        def logsm(x):
            x = x - x.max(axis=-1, keepdims=True)
            return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

        p_ref = np.exp(logsm(lr))
        kl = (p_ref * (logsm(lr) - logsm(le))).sum(axis=-1)
    elif kind == "sigmoid":
        def sig(x):
            return 1.0 / (1.0 + np.exp(-x))

        pr, pe = sig(lr).clip(1e-7, 1 - 1e-7), sig(le).clip(1e-7, 1 - 1e-7)
        kl = (pr * np.log(pr / pe)
              + (1 - pr) * np.log((1 - pr) / (1 - pe))).sum(axis=-1)
    else:
        raise ValueError(f"kind must be softmax|sigmoid, got {kind!r}")
    return float(kl.mean())


def inception_score(probs, splits: int = 10) -> float:
    """Inception Score over per-clip class probabilities (N, C) — the "IS"
    column of the paper's tables: exp(E_x KL(p(y|x) || p(y))), averaged
    over ``splits`` chunks (Salimans et al., arXiv 1606.03498; audio
    variant uses a tagger's probabilities, e.g. PANNs)."""
    import numpy as np

    p = np.asarray(probs, np.float64).clip(1e-7, None)
    p = p / p.sum(axis=-1, keepdims=True)
    n = p.shape[0]
    splits = max(1, min(splits, n))
    scores = []
    for part in np.array_split(p, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part) - np.log(marginal))).sum(axis=-1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores))
