"""Dataset manifest utilities.

Equivalents of reference ``audiotools/data/preprocess.py`` (``create_csv``)
and ``audiotools/core/util.py`` ``find_audio``: scan directories for audio
files and build CSV manifests with optional durations, in the column format
the EACaps dataset expects.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

AUDIO_EXTENSIONS = (".wav", ".flac", ".mp3", ".ogg")


def find_audio(folder: str, ext: Sequence[str] = AUDIO_EXTENSIONS) -> List[str]:
    out = []
    for root, _, files in os.walk(folder):
        for f in sorted(files):
            if f.lower().endswith(tuple(ext)):
                out.append(os.path.join(root, f))
    return out


def _duration(path: str) -> float:
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(path, mmap=True)
        return len(data) / sr
    except Exception:
        return 0.0


def create_csv(
    audio_dir: str,
    output_csv: str,
    split: str = "train",
    captions: Optional[dict] = None,
    loudness: bool = False,
    relative: bool = True,
) -> pd.DataFrame:
    """Build an EACaps-compatible manifest: one row per audio file with
    audio_path, caption, split, audio_length, absolute_index,
    fine_tune_data (and optionally loudness)."""
    paths = find_audio(audio_dir)
    rows = []
    for i, p in enumerate(paths):
        rel = os.path.relpath(p, audio_dir) if relative else p
        row = {
            "audio_path": rel,
            "caption": (captions or {}).get(rel, os.path.splitext(
                os.path.basename(p))[0].replace("_", " ")),
            "split": split,
            "audio_length": _duration(p),
            "absolute_index": i,
            "fine_tune_data": True,
        }
        if loudness:
            from ezaudio_tpu.audio.signal import AudioSignal

            try:
                row["loudness"] = AudioSignal.load(p).loudness()
            except Exception:
                row["loudness"] = -np.inf
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(output_csv, index=False)
    return df
