"""DAC compressed-file format + windowed compress/decompress + CLI.

Equivalents of reference ``src/modules/dac/model/base.py`` (DACFile,
CodecMixin.compress/decompress) and the ``python -m dac encode/decode`` CLI
(``src/modules/dac/utils/{encode,decode}.py``, ``__main__.py``):

  * ``DACFile``: codes (uint16) + metadata, ``.dac`` file via np.save;
  * ``compress``: loudness-normalize to -16 dB input, window into
    ``win_duration`` chunks (padded mode), RVQ-encode each chunk;
  * ``decompress``: decode chunks, stitch, restore input loudness, trim.
"""

from __future__ import annotations

import dataclasses
import math
import os
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.audio.loudness import integrated_loudness

SUPPORTED_VERSIONS = ["1.0.0"]


@dataclasses.dataclass
class DACFile:
    codes: np.ndarray  # (B, N, T) int
    chunk_length: int
    original_length: int
    input_db: float
    channels: int
    sample_rate: int
    padding: bool
    dac_version: str = SUPPORTED_VERSIONS[-1]

    def save(self, path: str) -> str:
        artifacts = {
            "codes": self.codes.astype(np.uint16),
            "metadata": {
                "input_db": np.float32(self.input_db),
                "original_length": self.original_length,
                "sample_rate": self.sample_rate,
                "chunk_length": self.chunk_length,
                "channels": self.channels,
                "padding": self.padding,
                "dac_version": self.dac_version,
            },
        }
        path = str(Path(path).with_suffix(".dac"))
        with open(path, "wb") as f:
            np.save(f, artifacts)  # noqa: allow pickle for the metadata dict
        return path

    @classmethod
    def load(cls, path: str) -> "DACFile":
        artifacts = np.load(path, allow_pickle=True)[()]
        meta = dict(artifacts["metadata"])
        if meta.get("dac_version") not in SUPPORTED_VERSIONS:
            raise RuntimeError(f"{path}: unsupported dac_version")
        return cls(codes=artifacts["codes"].astype(np.int64),
                   input_db=float(meta["input_db"]),
                   original_length=int(meta["original_length"]),
                   sample_rate=int(meta["sample_rate"]),
                   chunk_length=int(meta["chunk_length"]),
                   channels=int(meta["channels"]),
                   padding=bool(meta["padding"]))


class DACCodec:
    """Host-side wrapper over the flax DAC model: jitted chunked encode and
    decode, loudness-normalized .dac round trips."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._encode = jax.jit(
            lambda p, a: model.apply(
                {"params": p}, a,
                method=lambda m, a: m.encode(a)[1]))  # codes only
        self._decode_codes = jax.jit(
            lambda p, c: model.apply(
                {"params": p}, c,
                method=lambda m, c: m.decode(m.quantizer.from_codes(c)[0])))

    # ------------------------------------------------------------------
    def compress(self, wav: np.ndarray, sample_rate: int,
                 win_duration: float = 5.0, normalize_db: float = -16.0
                 ) -> DACFile:
        """wav (T,) float32 mono -> DACFile (padded-mode windowing)."""
        model = self.model
        assert sample_rate == model.sample_rate, (
            f"expected {model.sample_rate} Hz input")
        original_length = len(wav)
        input_db = integrated_loudness(wav, sample_rate)
        if normalize_db is not None and np.isfinite(input_db):
            wav = wav * (10 ** ((normalize_db - input_db) / 20))

        hop = model.hop_length
        chunk = int(round(win_duration * sample_rate / hop) * hop)
        n_chunks = max(1, math.ceil(len(wav) / chunk))
        padded = np.zeros(n_chunks * chunk, np.float32)
        padded[: len(wav)] = wav

        # dispatch every chunk before materializing any (each np.asarray
        # inside the loop would pay a full ~70 ms tunnel sync per chunk)
        codes = [self._encode(self.params, jnp.asarray(
            padded[i * chunk : (i + 1) * chunk])[None, :, None])
            for i in range(n_chunks)]
        codes = np.concatenate([np.asarray(c) for c in codes], axis=-1)
        return DACFile(
            codes=codes, chunk_length=chunk // hop,
            original_length=original_length,
            input_db=float(input_db) if np.isfinite(input_db) else -70.0,
            channels=1, sample_rate=sample_rate, padding=True)

    # ------------------------------------------------------------------
    def decompress(self, obj: DACFile, normalize_db: float = -16.0
                   ) -> np.ndarray:
        if obj.sample_rate != self.model.sample_rate:
            raise ValueError(
                f".dac file was encoded at {obj.sample_rate} Hz but this "
                f"model runs at {self.model.sample_rate} Hz")
        codes = jnp.asarray(obj.codes)
        T = codes.shape[-1]
        cl = obj.chunk_length
        outs = [self._decode_codes(self.params, codes[..., i : i + cl])
                for i in range(0, T, cl)]  # pipeline dispatches, sync after
        wav = np.concatenate([np.asarray(o)[0, :, 0] for o in outs])
        wav = wav[: obj.original_length]
        if normalize_db is not None and obj.input_db > -70.0:
            # reference base.py:285: re-measure the RECONSTRUCTION and gain
            # it to the recorded input loudness — assuming the decode sits
            # at normalize_db mis-scales whenever compress used a different
            # (or no) normalization
            out_db = integrated_loudness(wav, obj.sample_rate)
            if np.isfinite(out_db):
                wav = wav * (10 ** ((obj.input_db - out_db) / 20))
        return wav


# ---------------------------------------------------------------------------
# CLI: python -m ezaudio_tpu.codecs.dacfile encode/decode
# ---------------------------------------------------------------------------

def _cli():
    import argparse

    from ezaudio_tpu.codecs.dac import DAC
    from ezaudio_tpu.data.audio_io import load_wav, save_wav

    ap = argparse.ArgumentParser(description="DAC encode/decode CLI")
    sub = ap.add_subparsers(dest="cmd", required=True)
    enc = sub.add_parser("encode")
    enc.add_argument("input")
    enc.add_argument("--output", default=None)
    enc.add_argument("--win-duration", type=float, default=5.0)
    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("--output", default=None)
    for p in (enc, dec):
        p.add_argument("--ckpt", default=None, help="orbax params dir or torch .pth")
        p.add_argument("--sample-rate", type=int, default=44100)
    args = ap.parse_args()

    if args.cmd == "decode":
        # the .dac file's recorded rate is authoritative — building a
        # model at a different geometry would crash or decode at the
        # wrong rate
        args.sample_rate = DACFile.load(args.input).sample_rate
    model = DAC(sample_rate=args.sample_rate)
    if args.ckpt:
        if args.ckpt.endswith((".pt", ".pth")):
            from ezaudio_tpu.convert.torch_to_jax import (
                convert_dac_state_dict, load_torch_checkpoint)

            params = convert_dac_state_dict(load_torch_checkpoint(args.ckpt))
        else:
            import orbax.checkpoint as ocp

            params = ocp.StandardCheckpointer().restore(args.ckpt)
    else:
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key},
                            jnp.zeros((1, model.hop_length * 2, 1)))["params"]
    codec = DACCodec(model, params)

    if args.cmd == "encode":
        wav, sr = load_wav(args.input, sr=args.sample_rate)
        f = codec.compress(wav, sr, win_duration=args.win_duration)
        out = args.output or os.path.splitext(args.input)[0] + ".dac"
        print(f.save(out))
    else:
        f = DACFile.load(args.input)
        wav = codec.decompress(f)
        out = args.output or os.path.splitext(args.input)[0] + ".wav"
        save_wav(out, wav, f.sample_rate)
        print(out)


if __name__ == "__main__":
    _cli()
