"""External-binary audio seams, now mostly native.

The reference's audiotools carries mixins that shell out to external
resources: ffmpeg (ffmpeg.py:87-204: loudness/resample/load of non-wav
formats), Whisper transcription (whisper.py), and IPython/gradio playback.
In this build all three are native: non-wav decode goes through the
in-process libavcodec bridge (native/ezaudio_codec.cpp), transcription
through the flax Whisper (models/whisper.py), playback through
audio/playback.py.  ``ffmpeg_load`` keeps the CLI as a secondary path for
environments that have the binary but not the libraries.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def ffmpeg_load(path: str, sr: Optional[int] = None) -> tuple:
    """Decode any supported format -> (float32 mono, sr).

    Preference order: the in-process libavcodec bridge
    (native/ezaudio_codec.cpp — same codecs the ffmpeg CLI wraps, without
    the per-file fork the reference pays in ffmpeg.py:87-204), then the
    ffmpeg binary if one exists, then the native wav path for wavs."""
    from ezaudio_tpu.data import codec_loader

    if codec_loader.available() and not path.lower().endswith(".wav"):
        from ezaudio_tpu.data.audio_io import load_wav

        return load_wav(path, sr=sr)
    if ffmpeg_available():
        cmd = ["ffmpeg", "-i", path, "-f", "f32le", "-ac", "1"]
        if sr:
            cmd += ["-ar", str(sr)]
        cmd += ["pipe:1"]
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
        wav = np.frombuffer(out, np.float32)
        return wav, sr or _probe_sr(path)
    if path.lower().endswith(".wav"):
        from ezaudio_tpu.data.audio_io import load_wav

        return load_wav(path, sr=sr)
    raise ImportError(
        f"Decoding {path} requires the native codec bridge (libavformat/"
        "libavcodec + g++) or an ffmpeg binary; neither is available, so "
        "only .wav is supported.")


def _probe_sr(path: str) -> int:
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "a:0",
         "-show_entries", "stream=sample_rate", "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True).stdout.strip()
    return int(out)


def transcribe(wav: np.ndarray, sr: int, model: str = "openai/whisper-base"):
    """Whisper transcription (audiotools whisper mixin equivalent).

    Fully implemented in ezaudio_tpu.audio.whisper; `model` must be a LOCAL
    snapshot directory in this zero-egress environment (hub ids raise from
    transformers with a clear offline error)."""
    from ezaudio_tpu.audio.whisper import WhisperWrapper

    return WhisperWrapper(model=model).transcript(wav, sr)
