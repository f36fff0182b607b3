"""Training dataset: CSV-manifest audio-caption pairs.

Behavioral parity with reference ``src/dataset/audiocaps_v2.py`` (EACaps):
  * CSV metadata with columns ``audio_path, caption, split`` (plus
    ``fine_tune_data``, ``audio_length``, ``absolute_index``);
  * split / fine-tune filtering; zero-length filtering outside prepare mode;
  * channel policy: 5.1 -> front-pair mean; stereo -> mono mean, or (when
    ``mono=False``) random pick of mean/left/right;
  * random ``seg_length``-second crop, zero-pad to fixed length, peak
    normalization, augmentation hook;
  * offline-embedding mode: cached per-clip text embedding + mask with
    ``cfg_prob`` dropout to a cached uncond embedding (.npz instead of .pt);
  * ``prepare_mode`` to iterate (text, absolute_index) for embedding
    pre-computation.

TPU-first data flow: ``__getitem__`` returns numpy; ``batches()`` yields
fixed-shape numpy batches (shuffled, seeded, drop_remainder) ready for
``shard_batch`` onto the mesh — no torch DataLoader.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from ezaudio_tpu.data.audio_io import load_wav
from ezaudio_tpu.data.wav_aug import WavAugmentation


class EACaps:
    def __init__(self, data_dir: str, meta_dir: str, subset: str = "train",
                 fine_tune: bool = True, seg_length: float = 10, sr: int = 24000,
                 aug_config: Optional[dict] = None, norm: bool = True,
                 mono: bool = True, text_path: Optional[str] = None,
                 uncond_path: Optional[str] = None, cfg_prob: float = 0.0,
                 prepare_mode: bool = False, seed: int = 0,
                 use_native: bool = False, native_threads: int = 8, **kwargs):
        self.data_dir = data_dir
        meta = pd.read_csv(meta_dir)
        meta = meta[meta["split"] == subset]
        if fine_tune and "fine_tune_data" in meta.columns:
            meta = meta[meta["fine_tune_data"] == True]  # noqa: E712
        if not prepare_mode and "audio_length" in meta.columns:
            meta = meta[meta["audio_length"] != 0]
        self.meta = meta.reset_index(drop=True)
        self.seg_len = seg_length
        self.sr = sr
        self.norm = norm
        self.mono = mono
        self.prepare_mode = prepare_mode
        self.rng = np.random.default_rng(seed)
        self.augmenter = (WavAugmentation(aug_config, sr=sr, rng=self.rng)
                          if aug_config else None)
        self.text_path = text_path
        self.cfg_prob = cfg_prob
        self.uncond = None
        if text_path is not None:
            assert uncond_path is not None, "offline mode needs uncond_path"
            self.uncond = dict(np.load(uncond_path))
        # native C++ batch ingest (decode+crop+pad+normalize in a thread
        # pool) — usable when there is no augmentation and mono+norm match
        # its fixed policy
        self.use_native = False
        if use_native and self.augmenter is None and mono and norm:
            from ezaudio_tpu.data import native_loader

            if native_loader.available():
                self.use_native = True
                self.native_threads = native_threads

    def __len__(self):
        return len(self.meta)

    # ------------------------------------------------------------------
    def load_audio(self, audio_path: str) -> np.ndarray:
        # resample to the training rate (the reference librosa.load(sr=...)
        # resamples too — a stray 44.1 kHz file must not kill the run)
        y, sr = load_wav(audio_path, sr=self.sr, mono=False)
        if y.ndim == 1:
            y = y[None, :]
        if y.shape[0] == 6:
            y = y[:2].mean(axis=0, keepdims=True)
        if self.mono:
            y = y.mean(axis=0, keepdims=True)
        elif y.shape[0] == 2:
            pick = self.rng.integers(0, 3)
            y = y.mean(axis=0, keepdims=True) if pick == 0 else y[pick - 1 : pick]

        total = y.shape[-1]
        n = int(self.seg_len * self.sr)
        start = self.rng.integers(0, max(total - n, 0) + 1)
        end = min(start + n, total)
        clip = np.zeros(n, np.float32)
        clip[: end - start] = y[0, start:end]
        if self.norm:
            clip = clip / (np.abs(clip).max() + 1e-9)
        if self.augmenter is not None:
            clip = self.augmenter(clip)
        return clip

    # ------------------------------------------------------------------
    def __getitem__(self, index: int):
        row = self.meta.iloc[index]
        text = row["caption"]
        if self.prepare_mode:
            return text, str(row["absolute_index"])
        clip = self.load_audio(os.path.join(self.data_dir, str(row["audio_path"])))
        if self.text_path:
            if self.rng.random() < self.cfg_prob:
                emb = self.uncond
            else:
                emb = dict(np.load(os.path.join(
                    self.text_path, f"{row['absolute_index']}.npz")))
            return clip, emb["embedding"], emb["mask"]
        return clip, text

    # ------------------------------------------------------------------
    def batches(self, batch_size: int, shuffle: bool = True,
                drop_remainder: bool = True) -> Iterator[dict]:
        """Yield fixed-shape numpy batches for the jitted train step."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        n_full = len(order) // batch_size
        end = n_full * batch_size if drop_remainder else len(order)
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            if self.use_native and not self.prepare_mode and not self.text_path:
                from ezaudio_tpu.data import native_loader

                paths = [os.path.join(self.data_dir,
                                      str(self.meta.iloc[j]["audio_path"]))
                         for j in idx]
                audio, status = native_loader.load_batch(
                    paths, int(self.seg_len * self.sr), self.sr,
                    normalize=self.norm,
                    seed=int(self.rng.integers(1, 2**63 - 1)),
                    n_threads=self.native_threads)
                bad = np.nonzero(status)[0]
                for b in bad:  # fall back per-item on native errors
                    audio[b] = self.load_audio(paths[b])
                yield {"audio": audio,
                       "text": [str(self.meta.iloc[j]["caption"]) for j in idx]}
                continue
            items = [self[j] for j in idx]
            if self.prepare_mode:
                yield {"text": [it[0] for it in items],
                       "index": [it[1] for it in items]}
            elif self.text_path:
                yield {
                    "audio": np.stack([it[0] for it in items]),
                    "text": np.stack([it[1] for it in items]),
                    "text_mask": np.stack([it[2] for it in items]),
                }
            else:
                yield {"audio": np.stack([it[0] for it in items]),
                       "text": [it[1] for it in items]}


class ResumableIterator:
    """Deterministic, resumable epoch iterator (the reference's
    ResumableDistributedSampler role, audiotools/data/datasets.py:490-517):
    state = (epoch, step); restoring replays the same order and skips."""

    def __init__(self, dataset: EACaps, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self.step = 0

    def state_dict(self):
        return {"epoch": self.epoch, "step": self.step}

    def load_state_dict(self, state):
        self.epoch = int(state["epoch"])
        self.step = int(state["step"])

    def __iter__(self):
        while True:
            self.dataset.rng = np.random.default_rng((self.seed, self.epoch))
            if self.dataset.augmenter is not None:
                # the augmenter captured the init-time generator; rebind it
                # to the epoch stream or resumed runs replay different
                # augmentations than the uninterrupted run
                self.dataset.augmenter.rng = self.dataset.rng
            for i, batch in enumerate(self.dataset.batches(self.batch_size)):
                if i < self.step:
                    continue
                self.step = i + 1
                yield batch
            self.epoch += 1
            self.step = 0
