"""Fit the native NSIM->MOS mapping to the published MNRU characteristic
(VERDICT r4 item 6: repeat the PESQ MNRU trick for the ViSQOL core —
score-level, not just order-level, conformance).

ViSQOL's exact NSIM->MOS mapping is a trained SVR that ships only inside
Google's binary (reference: audiotools/metrics/quality.py:105), so
bit-exact parity is unimplementable here.  What IS reconstructable from
the ViSQOL papers (Hines et al. 2012/2015; Chinen et al. 2020) is the
*shape* of the mapping — a saturating sigmoid from the NSIM similarity
axis onto the subjective MOS scale — and the metric family's behavior on
standard degradations.  The anchor characteristic used here is the same
one the PESQ calibration uses (scripts/calibrate_pesq_mnru.py): MNRU
(ITU-T P.810) speech-correlated noise has a published approximately-
linear subjective-MOS-vs-Q law over Q in [10, 35] — slope ~0.1 MOS/dB
crossing ~2.9 at Q=25 — which every P.800-scale metric (PESQ, POLQA,
ViSQOL speech mode) is validated to track.

This script measures our nsim on MNRU-degraded deterministic synthetic
speech over a Q grid and fits the 3-parameter logistic

    MOS(nsim) = 1 + span / (1 + exp(-k * (nsim - c)))

to the anchor law by least squares (scipy), prints fit + residuals, and
the constants are baked into ezaudio_tpu/audio/quality.py::NSIM_MOS_CAL
(re-run after any neurogram-model change; CPU-only, <1 min).  The result
is documented as "MNRU-anchored, not Google-SVR-exact": the mapping is
monotone, so all order-level conformance rows are unchanged.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ezaudio_tpu.audio.quality as Q
from ezaudio_tpu.audio.effects import mnru

FS = 8000
QS = (10, 15, 20, 25, 30, 35)
N_REFS = 4


def anchor_mos(q):
    """Published-characteristic anchor (same as calibrate_pesq_mnru.py):
    linear 0.0985*Q + 0.463 on [10, 35]."""
    return float(np.clip(0.0985 * q + 0.463, 1.0, 4.5))


def main():
    refs = [Q.synthetic_speech(4.0, FS, seed=s) for s in range(N_REFS)]
    xs, ys = [], []  # (nsim, anchor MOS)
    per_q = {}
    for q in QS:
        vals = []
        for i, r in enumerate(refs):
            deg = mnru(r, q, seed=100 + i)
            vals.append(Q.visqol_nsim(deg, r, FS)["nsim"])
        per_q[q] = vals
        xs += vals
        ys += [anchor_mos(q)] * len(vals)
    # identity pins the top of the scale: nsim 1.0 -> 4.5+ (transparent)
    xs += [1.0] * N_REFS
    ys += [4.55] * N_REFS
    xs, ys = np.array(xs), np.array(ys)

    from scipy.optimize import curve_fit

    def logistic(x, span, k, c):
        return 1.0 + span / (1.0 + np.exp(-k * (x - c)))

    (span, k, c), _ = curve_fit(logistic, xs, ys, p0=(3.6, 25.0, 0.88),
                                maxfev=20000)
    print(f"fitted NSIM_MOS_CAL = ({span:.4f}, {k:.4f}, {c:.4f})   "
          f"[baked in: {getattr(Q, 'NSIM_MOS_CAL', None)}]")

    print("\n| Q (dB) | anchor MOS | mean nsim | calibrated mos | residual |")
    print("|---|---|---|---|---|")
    worst = 0.0
    for q in QS:
        m = float(np.mean([logistic(v, span, k, c) for v in per_q[q]]))
        res = m - anchor_mos(q)
        worst = max(worst, abs(res))
        print(f"| {q} | {anchor_mos(q):.2f} | {np.mean(per_q[q]):.4f} | "
              f"{m:.2f} | {res:+.2f} |")
    ident = logistic(1.0, span, k, c)
    print(f"| identity | 4.5+ | 1.0000 | {ident:.2f} | "
          f"{ident - 4.55:+.2f} |")
    print(f"\nworst MNRU residual: {worst:.3f} MOS (documented bound: 0.35)")


if __name__ == "__main__":
    main()
