"""Listening reports and preference tests (static HTML).

Equivalents of reference ``audiotools/post.py`` (HTML audio comparison
tables) and the data model of ``audiotools/preference.py`` (AB/MUSHRA
preference tests; the reference wraps gradio, which is not in this image —
the test protocol, randomization and result CSV are implemented here and
render to a self-contained static page).
"""

from __future__ import annotations

import base64
import html
import io
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

def _audio_tag(wav: np.ndarray, sr: int) -> str:
    buf = io.BytesIO()
    from scipy.io import wavfile

    wavfile.write(buf, sr, np.asarray(wav, np.float32))
    b64 = base64.b64encode(buf.getvalue()).decode()
    return (f'<audio controls preload="none">'
            f'<source src="data:audio/wav;base64,{b64}" type="audio/wav">'
            f"</audio>")


def audio_table(samples: Dict[str, Dict[str, np.ndarray]], sr: int,
                title: str = "ezaudio-tpu listening report") -> str:
    """Build an HTML table: rows = sample names, columns = condition names
    (post.py:12 audio_table equivalent, with embedded base64 audio)."""
    conditions: List[str] = sorted({c for row in samples.values() for c in row})
    head = "".join(f"<th>{html.escape(c)}</th>" for c in conditions)
    rows = []
    for name, row in samples.items():
        cells = "".join(
            f"<td>{_audio_tag(row[c], sr) if c in row else '—'}</td>"
            for c in conditions)
        rows.append(f"<tr><td><b>{html.escape(str(name))}</b></td>{cells}</tr>")
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>body{{font-family:sans-serif}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:6px}}</style></head>
<body><h2>{html.escape(title)}</h2>
<table><tr><th>sample</th>{head}</tr>{''.join(rows)}</table></body></html>"""


def write_report(path: str, samples: Dict[str, Dict[str, np.ndarray]],
                 sr: int, **kw) -> str:
    with open(path, "w") as f:
        f.write(audio_table(samples, sr, **kw))
    return path


class PreferenceTest:
    """AB(X) preference-test data model (preference.py:239-600 equivalent):
    blinded, order-randomized condition pairs with a CSV result sink."""

    def __init__(self, conditions: Sequence[str], samples: Sequence[str],
                 seed: int = 0, results_csv: Optional[str] = None):
        assert len(conditions) >= 2
        self.conditions = list(conditions)
        self.samples = list(samples)
        self.results_csv = results_csv
        rnd = random.Random(seed)
        self.trials = []
        for s in self.samples:
            pair = rnd.sample(self.conditions, 2)
            self.trials.append({"sample": s, "A": pair[0], "B": pair[1]})
        if results_csv and not os.path.exists(results_csv):
            with open(results_csv, "w") as f:
                f.write("user,sample,A,B,choice\n")

    def record(self, user: str, trial_idx: int, choice: str):
        t = self.trials[trial_idx]
        assert choice in ("A", "B", "tie")
        if self.results_csv:
            with open(self.results_csv, "a") as f:
                f.write(f"{user},{t['sample']},{t['A']},{t['B']},{choice}\n")
        return {**t, "choice": choice}

    def tally(self) -> Dict[str, int]:
        import csv

        wins = {c: 0 for c in self.conditions}
        if not self.results_csv or not os.path.exists(self.results_csv):
            return wins
        with open(self.results_csv) as f:
            for row in csv.DictReader(f):
                if row["choice"] in ("A", "B"):
                    wins[row[row["choice"]]] += 1
        return wins

    def render_html(self, audio: Dict[str, Dict[str, np.ndarray]], sr: int
                    ) -> str:
        """Blinded trial page: conditions shown only as A/B."""
        blocks = []
        for i, t in enumerate(self.trials):
            a = _audio_tag(audio[t["sample"]][t["A"]], sr)
            b = _audio_tag(audio[t["sample"]][t["B"]], sr)
            blocks.append(
                f"<div><h3>Trial {i}</h3>A: {a} &nbsp; B: {b}</div>")
        return ("<!doctype html><html><body><h2>Preference test</h2>"
                + "".join(blocks) + "</body></html>")
