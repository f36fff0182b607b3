"""Micro-batching generation server.

The reference exposes only a blocking per-call API (plus gradio demos).
For production serving on TPU the economics are different: a single chip
runs the 100-step XL sampler at ~6x real time at batch 4+ (BASELINE.md),
so the server's job is to aggregate concurrent requests into fixed-size
batches that hit the jit cache.

Design:
  * requests enter a queue; a scheduler thread drains up to
    ``max_batch_size`` requests (waiting at most ``max_wait_ms`` for the
    batch to fill);
  * batches are padded to a fixed set of bucket sizes so every call reuses
    a compiled program (no shape churn);
  * heterogeneous lengths: each request may carry its own ``length``;
    requests are grouped by *length bucket* (``length_buckets``, rounded
    up) so each group hits one compiled program, and the waveform is
    trimmed to the requested length afterwards — the latent-frame analog
    of the batch buckets;
  * editing requests (``submit_edit``) ride the same queue and are served
    per-request (the editing API is single-clip by contract);
  * each request carries its own seed; results come back through futures.

This is a host-side component; the device work is EzAudio.generate_audio's
jitted pipeline (which itself shards over a device mesh when the EzAudio
was built with one — see ezaudio_tpu.api.ezaudio).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class _Request:
    text: str
    seed: int
    kind: str = "generate"            # "generate" | "edit" | "controlnet"
    length: Optional[float] = None    # requested seconds (generate)
    bucket: Optional[float] = None    # compiled length bucket (generate)
    edit_kwargs: Optional[dict] = None
    future: Future = field(default_factory=Future)


class GenerationServer:
    def __init__(
        self,
        ez,  # EzAudio-like: generate_audio(list[str], ...) -> (sr, (B, T))
        max_batch_size: int = 8,
        max_wait_ms: float = 50.0,
        batch_buckets: Optional[Sequence[int]] = None,
        length: float = 10.0,
        length_buckets: Optional[Sequence[float]] = None,
        ddim_steps: int = 100,
        guidance_scale: float = 5.0,
        guidance_rescale: float = 0.75,
        sampler: str = "ddim",
        guidance_interval: Optional[Tuple[float, float]] = None,
        quant: Optional[str] = None,
        layer_cache: Optional[Tuple[int, int]] = None,
        attn_impl: Optional[str] = None,
        cfg_refresh: int = 1,  # uncond every P-th in-band group (dpm)
        fused: bool = False,  # single-dispatch pipeline (api fused=True)
        controlnet=None,  # EzAudioControlNet(base=ez) — share ez's params
        clap_scorer=None,  # CLAPScorer enabling submit_reranked
    ):
        if sampler == "distilled" and (layer_cache is not None
                                       or guidance_interval is not None):
            # fail at construction, not on the first drained batch:
            # generate_audio rejects this composition per-request
            raise ValueError(
                "sampler='distilled' does not compose with layer_cache or "
                "guidance_interval (guidance is folded into the student)")
        self.ez = ez
        self.controlnet = controlnet
        self.clap_scorer = clap_scorer
        self.max_batch_size = max_batch_size
        self.max_wait = max_wait_ms / 1000.0
        # on a mesh, align buckets to the data-parallel world so padded
        # batches shard without extra internal padding in generate_audio
        world = getattr(ez, "_world", 1) or 1
        if world > 1:
            self.max_batch_size = max_batch_size = (
                -(-max_batch_size // world) * world)
        buckets = list(batch_buckets
                       or [b for b in (1, 2, 4, 8, 16) if b <= max_batch_size])
        self.buckets = sorted({-(-b // world) * world for b in buckets}
                              | {max_batch_size})  # a bucket >= any drain
        self.default_length = float(length)
        # length buckets: a per-request length rounds UP to the nearest
        # bucket (one compiled program per bucket); lengths above every
        # bucket run at their exact value (a new compile per distinct value)
        self.length_buckets = sorted(
            {float(b) for b in (length_buckets or [])} | {self.default_length})
        self.gen_kwargs = dict(ddim_steps=ddim_steps,
                               guidance_scale=guidance_scale,
                               guidance_rescale=guidance_rescale,
                               sampler=sampler,
                               guidance_interval=guidance_interval,
                               quant=quant,
                               layer_cache=layer_cache, attn_impl=attn_impl,
                               cfg_refresh=cfg_refresh, fused=fused)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"requests": 0, "batches": 0, "padded_slots": 0,
                      "edit_requests": 0, "controlnet_requests": 0,
                      "rerank_requests": 0}

    # ------------------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)
        # resolve still-queued requests so no waiter blocks forever
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.future.cancel()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------------
    def _length_bucket(self, length: float) -> float:
        for b in self.length_buckets:
            if length <= b:
                return b
        return float(length)  # above every bucket: exact-length program

    def submit(self, text: str, seed: Optional[int] = None,
               length: Optional[float] = None) -> Future:
        """Enqueue a generation request.  ``length`` (seconds) defaults to
        the server's configured length; it is rounded up to a length bucket
        for compilation reuse and the result is trimmed back."""
        if self._stop.is_set():
            raise RuntimeError(
                "GenerationServer is stopped; requests submitted now would "
                "never be processed")
        length = float(length if length is not None else self.default_length)
        req = _Request(text=text,
                       seed=int(seed if seed is not None
                                else np.random.randint(0, 2**31 - 1)),
                       length=length, bucket=self._length_bucket(length))
        self.stats["requests"] += 1
        self._q.put(req)
        return req.future

    def submit_edit(self, text: str, gt_file, boundary: float,
                    mask_start: float, mask_length: float,
                    seed: Optional[int] = None, **kw) -> Future:
        """Enqueue an editing (inpaint/outpaint) request — served through
        the same scheduler, dispatched per-request (the editing API is
        single-clip; reference api/ezaudio.py:132-207)."""
        if self._stop.is_set():
            raise RuntimeError(
                "GenerationServer is stopped; requests submitted now would "
                "never be processed")
        edit_kwargs = dict(gt_file=gt_file, boundary=boundary,
                           mask_start=mask_start, mask_length=mask_length,
                           **kw)
        req = _Request(text=text,
                       seed=int(seed if seed is not None
                                else np.random.randint(0, 2**31 - 1)),
                       kind="edit", edit_kwargs=edit_kwargs)
        self.stats["requests"] += 1
        self.stats["edit_requests"] += 1
        self._q.put(req)
        return req.future

    def submit_controlnet(self, text: str, audio_path, seed: Optional[int]
                          = None, **kw) -> Future:
        """Enqueue a ControlNet-conditioned generation (energy/chroma/...)
        — served through the same scheduler, dispatched per-request (the
        ControlNet API is single-clip; reference api/controlnet.py:97-160).
        ``kw`` passes through to ``EzAudioControlNet.generate_audio``
        (ddim_steps, conditioning_scale, surpass_noise, ...); the server's
        ``quant``/``sampler`` recipe applies unless overridden here."""
        if self.controlnet is None:
            raise ValueError(
                "this GenerationServer was built without a controlnet=; "
                "pass an EzAudioControlNet sharing the same base EzAudio")
        if self._stop.is_set():
            raise RuntimeError(
                "GenerationServer is stopped; requests submitted now would "
                "never be processed")
        req = _Request(text=text,
                       seed=int(seed if seed is not None
                                else np.random.randint(0, 2**31 - 1)),
                       kind="controlnet",
                       edit_kwargs=dict(audio_path=audio_path, **kw))
        self.stats["requests"] += 1
        self.stats["controlnet_requests"] += 1
        self._q.put(req)
        return req.future

    def submit_reranked(self, text: str, n_candidates: int = 4,
                        seed: Optional[int] = None,
                        length: Optional[float] = None, **kw) -> Future:
        """Enqueue a best-of-K reranked generation (one batched K-candidate
        call scored by the server's ``clap_scorer`` — see
        ``EzAudio.generate_audio_reranked``).  Dispatched per-request: the
        K candidates already fill a device batch."""
        if self.clap_scorer is None:
            raise ValueError(
                "this GenerationServer was built without a clap_scorer=; "
                "pass a CLAPScorer (ezaudio_tpu.audio.clap) to enable "
                "submit_reranked")
        if self._stop.is_set():
            raise RuntimeError(
                "GenerationServer is stopped; requests submitted now would "
                "never be processed")
        req = _Request(text=text,
                       seed=int(seed if seed is not None
                                else np.random.randint(0, 2**31 - 1)),
                       kind="rerank",
                       length=float(length if length is not None
                                    else self.default_length),
                       edit_kwargs=dict(n_candidates=int(n_candidates), **kw))
        self.stats["requests"] += 1
        self.stats["rerank_requests"] += 1
        self._q.put(req)
        return req.future

    def generate(self, text: str, seed: Optional[int] = None,
                 timeout: Optional[float] = None,
                 length: Optional[float] = None) -> Tuple[int, np.ndarray]:
        return self.submit(text, seed, length=length).result(timeout)

    # ------------------------------------------------------------------
    def _slot_noise(self, seed: int, length: Optional[float] = None
                    ) -> np.ndarray:
        """(frames, latent_dim) starting noise for one slot, identical to
        what a solo ``generate_audio(random_seed=seed)`` would draw
        (PRNGKey(seed) -> split -> k_noise -> normal, in the model dtype)."""
        import jax

        if length is None:
            length = self.default_length
        frames = int(length * self.ez.latent_sr)
        k_noise, _ = jax.random.split(jax.random.PRNGKey(int(seed)))
        dtype = getattr(self.ez, "dtype", None)
        kw = {"dtype": dtype} if dtype is not None else {}
        return np.asarray(jax.random.normal(
            k_noise, (1, frames, self.ez.latent_dim), **kw))[0]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return n  # unreachable (max_batch_size is always a bucket)

    def _drain(self) -> List[_Request]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.max_wait
        import time

        t0 = time.perf_counter()
        while len(batch) < self.max_batch_size:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    # ------------------------------------------------------------------
    def _run_generate(self, bucket_len: float, group: List[_Request]):
        n = len(group)
        size = self._bucket(n)
        # pad slots repeat real prompts: an empty-string pad would trip
        # the reference's "empty prompt -> CFG off" rule for the whole
        # batch (api/ezaudio.py generate_audio); batch elements are
        # independent through the model, so duplicates are harmless
        texts = [group[i % n].text for i in range(size)]
        self.stats["batches"] += 1
        self.stats["padded_slots"] += size - n
        try:
            # per-request seeds: each slot's starting noise comes from
            # that request's own PRNGKey (matching a solo
            # generate_audio(random_seed=seed, length=bucket) draw), so a
            # (text, seed, length-bucket) triple reproduces across batch
            # compositions — exactly for the deterministic samplers
            # (eta=0 ddim / dpm); the shared eta-noise stream still
            # follows group[0].seed
            extra = {}
            if hasattr(self.ez, "latent_sr") and hasattr(self.ez,
                                                         "latent_dim"):
                extra["initial_latents"] = np.stack([
                    self._slot_noise(group[i % n].seed, bucket_len)
                    for i in range(size)])
            sr, wavs = self.ez.generate_audio(
                texts, random_seed=group[0].seed, length=bucket_len,
                **extra, **self.gen_kwargs)
            for i, r in enumerate(group):
                wav = np.asarray(wavs[i])
                if r.length is not None and r.length < bucket_len:
                    wav = wav[: int(r.length * sr)]
                r.future.set_result((sr, wav))
        except Exception as e:  # propagate to all waiters
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)

    def _run_edit(self, req: _Request):
        self.stats["batches"] += 1
        try:
            # pass through only the knobs editing_audio accepts (it has its
            # own guidance defaults and no sampler switch — DDIM parity)
            kw = {k: self.gen_kwargs[k]
                  for k in ("ddim_steps", "quant", "layer_cache", "attn_impl")
                  if k in self.gen_kwargs}
            kw.update(req.edit_kwargs)
            sr, wav = self.ez.editing_audio(req.text, random_seed=req.seed,
                                            **kw)
            req.future.set_result((sr, np.asarray(wav)))
        except Exception as e:
            if not req.future.done():
                req.future.set_exception(e)

    def _run_rerank(self, req: _Request):
        self.stats["batches"] += 1
        try:
            kw = {k: v for k, v in self.gen_kwargs.items()
                  if k != "fused"}  # rerank runs the staged batched path
            kw.update(req.edit_kwargs)
            sr, wav = self.ez.generate_audio_reranked(
                req.text, self.clap_scorer, random_seed=req.seed,
                length=req.length, **kw)
            req.future.set_result((sr, np.asarray(wav)))
        except Exception as e:
            if not req.future.done():
                req.future.set_exception(e)

    def _run_controlnet(self, req: _Request):
        self.stats["batches"] += 1
        try:
            # server recipe knobs the ControlNet API accepts; per-request
            # kwargs win (layer_cache/attn_impl/fused are t2a-only knobs)
            kw = {k: self.gen_kwargs[k]
                  for k in ("quant", "sampler", "ddim_steps")
                  if self.gen_kwargs.get(k) is not None}
            kw.update(req.edit_kwargs)
            sr, wav = self.controlnet.generate_audio(
                req.text, random_seed=req.seed, **kw)
            req.future.set_result((sr, np.asarray(wav)))
        except Exception as e:
            if not req.future.done():
                req.future.set_exception(e)

    def _loop(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            # group by (kind, length-bucket): each generate group hits one
            # compiled program; edits/controlnet dispatch per-request
            groups = {}
            for r in batch:
                if r.kind == "edit":
                    self._run_edit(r)
                elif r.kind == "controlnet":
                    self._run_controlnet(r)
                elif r.kind == "rerank":
                    self._run_rerank(r)
                else:
                    groups.setdefault(r.bucket, []).append(r)
            for bucket_len, group in sorted(groups.items()):
                self._run_generate(bucket_len, group)
