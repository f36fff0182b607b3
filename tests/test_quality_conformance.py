"""Conformance battery for the native intrusive quality metrics.

VERDICT r2 item 6: PESQ (audio/quality.py) and NSIM (the ViSQOL core) were
previously validated only by identity + monotone-in-SNR.  This battery
anchors them to the PUBLISHED qualitative behavior of ITU-T P.862 and
ViSQOL on the standard degradation families those metrics were designed
around (reference wrappers: audiotools/metrics/quality.py:64,105):

  * MNRU (ITU-T P.810) modulated noise at Q = 5..35 dB — the canonical
    P.862 conformance axis: MOS must increase monotonically with Q with a
    wide spread (P.862 Annex: MNRU conditions span roughly MOS 1..4.5);
  * additive white noise at increasing SNR — monotone;
  * low-pass band-limiting — wider band scores higher (P.862's most-cited
    behavior after noise; telephone-band 3.4 kHz ~ near-transparent at nb);
  * amplitude clipping at decreasing thresholds — monotone;
  * codec family ordering: G.711-style mu-law 8-bit is a known
    high-quality condition for PESQ (published nb scores ~4.0+) and must
    rank above strong noise/MNRU conditions; 4-bit mu-law must rank below
    8-bit (quantization-noise ordering);
  * cross-metric agreement: PESQ and NSIM must agree on the RANKING of a
    pooled mild-vs-severe condition set (Spearman > 0.8) — the property
    papers actually rely on when comparing systems.

Honesty note (also in docs/DESIGN.md): our PESQ uses analytic Bark/
threshold forms instead of the ITU's tabulated 42-band constants, and our
NSIM->MOS map is a logistic fit, not Google's SVR — absolute values are
NOT bit-comparable to the reference binaries; these tests pin the
orderings, which is what the scores are used for here.
"""

import numpy as np
import pytest

from ezaudio_tpu.audio.effects import band_limit, mnru, mulaw_quantization
from ezaudio_tpu.audio.quality import pesq, stoi, visqol_nsim

FS = 8000


def speech_like(seconds: float = 4.0, fs: int = FS, seed: int = 0):
    """Synthetic speech-like probe: harmonic source (F0 ~ 120 Hz with
    vibrato) shaped by formant-ish resonances, amplitude-modulated at a
    syllabic ~3.5 Hz rate with silent gaps."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    f0 = 120.0 * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    src = sum(np.sin(k * phase) / k for k in range(1, 13))
    # formant emphasis via FFT shaping at ~500/1500/2500 Hz
    spec = np.fft.rfft(src)
    f = np.fft.rfftfreq(len(src), 1.0 / fs)
    shape = sum(np.exp(-0.5 * ((f - fc) / bw) ** 2)
                for fc, bw in ((500, 200), (1500, 300), (2500, 400)))
    voiced = np.fft.irfft(spec * (0.1 + shape), len(src))
    # syllabic on/off envelope with gaps (PESQ needs active+silent frames)
    env = np.clip(np.sin(2 * np.pi * 3.5 * t + rng.uniform(0, np.pi)), 0, 1)
    x = voiced * env
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


def add_noise_snr(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x)).astype(np.float32)
    n *= np.linalg.norm(x) / np.linalg.norm(n) * 10 ** (-snr_db / 20)
    return x + n


@pytest.fixture(scope="module")
def ref():
    return speech_like()


def _monotone(scores, tol=0.0):
    diffs = np.diff(scores)
    assert (diffs > -tol).all(), scores
    assert diffs.sum() > 0, scores


class TestPESQConformance:
    def test_mnru_monotone_with_wide_spread(self, ref):
        qs = [5, 10, 15, 20, 25, 30, 35]
        scores = [pesq(mnru(ref, q), ref, FS) for q in qs]
        _monotone(scores, tol=0.02)
        # P.862's MNRU anchor conditions span most of the MOS scale.
        # Measured curve (deterministic): 2.63 -> 4.18.  The ITU binary
        # would push Q=5 dB lower (~1.5): our analytic Bark/threshold
        # approximation compresses severity at the bottom of the scale —
        # documented in docs/DESIGN.md; the ordering (what scores are used
        # for here) is exact.
        assert scores[-1] - scores[0] > 1.4, scores
        assert scores[0] < 2.8, scores       # Q=5 dB is a severe condition
        assert scores[-1] > 3.5, scores      # Q=35 dB is near-transparent

    def test_mnru_score_level_anchoring(self):
        """Score-LEVEL conformance (VERDICT r3 item 7): on the calibration
        signal family (quality.synthetic_speech, P.810 MNRU), pesq must
        land within +-0.35 MOS of the published P.862 MNRU characteristic
        (~0.1 MOS/dB, ~2.9 @ Q=25; reconstructed from the P.862
        literature — see PESQ_CAL provenance in audio/quality.py).
        Held-out check: refs (seeds 4-9) and noise seeds DIFFER from the
        ones the constants were fitted on (seeds 0-3,
        scripts/calibrate_pesq_mnru.py).  The bound applies to the
        FAMILY MEAN — per-reference spread is ~0.15-0.35 MOS std, the
        same order as real PESQ's per-material spread on MNRU."""
        from ezaudio_tpu.audio.quality import synthetic_speech

        refs = [synthetic_speech(4.0, FS, seed=s) for s in range(4, 10)]
        for q, anchor in ((10, 1.45), (15, 1.94), (25, 2.93), (35, 3.91)):
            mos = np.mean([pesq(mnru(r, q, seed=500 + i), r, FS)
                           for i, r in enumerate(refs)])
            assert abs(mos - anchor) < 0.35, (q, mos, anchor)

    def test_noise_snr_monotone(self, ref):
        snrs = [0, 10, 20, 30, 40]
        scores = [pesq(add_noise_snr(ref, s), ref, FS) for s in snrs]
        _monotone(scores, tol=0.02)
        assert scores[-1] - scores[0] > 1.0, scores

    def test_band_limit_ordering(self, ref):
        cuts = [800, 1600, 2400, 3200]
        scores = [pesq(band_limit(ref, FS, c), ref, FS) for c in cuts]
        _monotone(scores, tol=0.02)
        # telephone-band (3.2+ kHz at fs=8k) is a mild condition vs 800 Hz
        assert scores[-1] > scores[0] + 0.5, scores

    def test_clipping_ordering(self, ref):
        # clip at decreasing fractions of the peak -> increasing
        # distortion (NB: percentile-of-|x| thresholds are useless on a
        # signal with silent gaps — 40% of samples are ~0)
        mx = np.abs(ref).max()
        fracs = [0.1, 0.3, 0.5, 0.8]
        scores = [pesq(np.clip(ref, -c * mx, c * mx), ref, FS)
                  for c in fracs]
        _monotone(scores, tol=0.02)
        assert scores[-1] - scores[0] > 1.5, scores

    def test_mulaw_codec_ranks_high(self, ref):
        # published P.862 behavior: G.711 (mu-law 8-bit) is a high-quality
        # condition (~4+); it must outrank strong noise and MNRU conditions
        # and 4-bit mu-law (quantization-noise ordering)
        s_g711 = pesq(mulaw_quantization(ref, 256), ref, FS)
        s_mu4 = pesq(mulaw_quantization(ref, 16), ref, FS)
        s_noise10 = pesq(add_noise_snr(ref, 10), ref, FS)
        s_mnru15 = pesq(mnru(ref, 15), ref, FS)
        assert s_g711 > 3.5, s_g711
        assert s_g711 > s_mu4 > min(s_noise10, s_mnru15), (
            s_g711, s_mu4, s_noise10, s_mnru15)
        assert s_g711 > s_noise10 and s_g711 > s_mnru15

    def test_identity_is_ceiling(self, ref):
        s = pesq(ref, ref, FS)
        assert s > 4.4
        for deg in (mnru(ref, 20), add_noise_snr(ref, 20),
                    mulaw_quantization(ref, 256)):
            assert pesq(deg, ref, FS) < s + 1e-6


class TestNSIMConformance:
    def test_mnru_score_level_anchoring(self):
        """Score-LEVEL conformance (VERDICT r4 item 6, the PESQ trick
        repeated for the ViSQOL core): on the calibration signal family
        (quality.synthetic_speech, P.810 MNRU), the NSIM_MOS_CAL-mapped
        mos must land within +-0.35 MOS of the same published MNRU
        characteristic the PESQ calibration targets.  Held-out: refs
        (seeds 4-9) and noise seeds DIFFER from the fit's (seeds 0-3,
        scripts/calibrate_nsim_mnru.py).  MNRU-anchored, not
        Google-SVR-exact — the bound applies to the FAMILY MEAN."""
        from ezaudio_tpu.audio.quality import synthetic_speech

        refs = [synthetic_speech(4.0, FS, seed=s) for s in range(4, 10)]
        for q, anchor in ((10, 1.45), (15, 1.94), (25, 2.93), (35, 3.91)):
            mos = np.mean([
                visqol_nsim(mnru(r, q, seed=500 + i), r, FS)["mos"]
                for i, r in enumerate(refs)])
            assert abs(mos - anchor) < 0.35, (q, mos, anchor)

    def test_identity_mos_is_transparent(self, ref):
        assert visqol_nsim(ref, ref, FS)["mos"] > 4.4

    def test_mnru_monotone(self, ref):
        qs = [5, 15, 25, 35]
        scores = [visqol_nsim(mnru(ref, q), ref, FS)["nsim"] for q in qs]
        _monotone(scores)

    def test_band_limit_monotone(self, ref):
        cuts = [800, 1600, 2400, 3200]
        scores = [visqol_nsim(band_limit(ref, FS, c), ref, FS)["nsim"]
                  for c in cuts]
        _monotone(scores)

    def test_identity_is_ceiling(self, ref):
        s = visqol_nsim(ref, ref, FS)["nsim"]
        assert s > 0.999
        assert visqol_nsim(mnru(ref, 20), ref, FS)["nsim"] < s


class TestCrossMetricRankAgreement:
    def test_spearman_pesq_vs_nsim(self, ref):
        """Across a pooled battery spanning mild to severe conditions, the
        two native metrics must RANK conditions consistently (this ordering
        is what system comparisons in papers rely on)."""
        mx = np.abs(ref).max()
        conditions = [
            mnru(ref, 8), mnru(ref, 16), mnru(ref, 28),
            add_noise_snr(ref, 5), add_noise_snr(ref, 18),
            add_noise_snr(ref, 32),
            band_limit(ref, FS, 1000), band_limit(ref, FS, 2800),
            np.clip(ref, -0.3 * mx, 0.3 * mx), mulaw_quantization(ref, 256),
        ]
        p = np.array([pesq(c, ref, FS) for c in conditions])
        v = np.array([visqol_nsim(c, ref, FS)["nsim"] for c in conditions])
        from scipy.stats import spearmanr

        rho = spearmanr(p, v).statistic
        assert rho > 0.8, (rho, p, v)

    def test_stoi_agrees_on_noise_axis(self, ref):
        snrs = [0, 10, 20, 30]
        s = [stoi(add_noise_snr(ref, x), ref, FS) for x in snrs]
        _monotone(np.array(s))
