"""Offline T5 embedding pre-computation.

The reference trains with cached text embeddings (EACaps ``text_path`` mode,
dataset/audiocaps_v2.py:106-113; prepared via ``prepare_mode``).  This
script renders every caption in a CSV manifest through the T5 encoder and
writes one ``{absolute_index}.npz`` per clip (keys: embedding, mask) plus
``uncond.npz`` for the empty prompt.

Usage:
  python -m ezaudio_tpu.training.prepare_embeddings \
      --config-name <cfg.yml> --meta <meta.csv> --out-dir <dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def prepare(ez, meta_csv: str, out_dir: str, subset: str = "train",
            batch_size: int = 32) -> int:
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_csv(meta_csv)
    df = df[df["split"] == subset]

    emb, mask = ez.embed_text([""])
    np.savez(os.path.join(out_dir, "uncond.npz"),
             embedding=np.asarray(emb[0]), mask=np.asarray(mask[0]))

    rows = list(df.iterrows())
    n = 0
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        texts = [str(r["caption"]) for _, r in chunk]
        emb, mask = ez.embed_text(texts)
        emb, mask = np.asarray(emb), np.asarray(mask)
        for j, (_, r) in enumerate(chunk):
            np.savez(os.path.join(out_dir, f"{r['absolute_index']}.npz"),
                     embedding=emb[j], mask=mask[j])
            n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", required=True)
    ap.add_argument("--meta", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--subset", default="train")
    ap.add_argument("--t5-ckpt", default=None)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args(argv)

    from ezaudio_tpu.api.ezaudio import EzAudio

    ez = EzAudio(config_path=args.config_name, t5_path=args.t5_ckpt)
    n = prepare(ez, args.meta, args.out_dir, args.subset, args.batch_size)
    print(f"wrote {n} embeddings to {args.out_dir}")


if __name__ == "__main__":
    main()
