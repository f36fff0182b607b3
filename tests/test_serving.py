"""Micro-batching generation server tests (fake backend)."""

import threading
import time

import numpy as np
import pytest

from ezaudio_tpu.serving import GenerationServer


class FakeEz:
    """Deterministic stand-in: waveform encodes the prompt hash."""

    def __init__(self, delay=0.01):
        self.delay = delay
        self.calls = []
        self.lock = threading.Lock()

    def generate_audio(self, texts, random_seed=None, **kw):
        with self.lock:
            self.calls.append(list(texts))
        time.sleep(self.delay)
        B = len(texts)
        wavs = np.stack([np.full(16, float(hash(t) % 1000)) for t in texts])
        return 24000, wavs


class TestGenerationServer:
    def test_single_request(self):
        ez = FakeEz()
        with GenerationServer(ez, max_batch_size=4, max_wait_ms=10) as srv:
            sr, wav = srv.generate("hello", seed=1, timeout=10)
        assert sr == 24000
        assert wav.shape == (16,)
        assert wav[0] == float(hash("hello") % 1000)

    def test_batching_aggregates(self):
        ez = FakeEz(delay=0.05)
        with GenerationServer(ez, max_batch_size=4, max_wait_ms=200) as srv:
            futs = [srv.submit(f"p{i}", seed=i) for i in range(4)]
            results = [f.result(timeout=10) for f in futs]
        assert all(r[1].shape == (16,) for r in results)
        # at least one call contained multiple real prompts
        assert any(sum(1 for t in c if t) >= 2 for c in ez.calls)
        # each request got its own prompt's waveform
        for i, (sr, wav) in enumerate(results):
            assert wav[0] == float(hash(f"p{i}") % 1000)

    def test_bucket_padding(self):
        ez = FakeEz()
        with GenerationServer(ez, max_batch_size=8, max_wait_ms=100,
                              batch_buckets=[4, 8]) as srv:
            futs = [srv.submit(f"x{i}") for i in range(3)]
            [f.result(timeout=10) for f in futs]
        # 3 requests pad into a 4-bucket
        assert any(len(c) == 4 for c in ez.calls)

    def test_error_propagates(self):
        class Broken:
            def generate_audio(self, *a, **k):
                raise RuntimeError("boom")

        with GenerationServer(Broken(), max_wait_ms=10) as srv:
            fut = srv.submit("x")
            try:
                fut.result(timeout=10)
                raised = False
            except RuntimeError:
                raised = True
        assert raised


class TestServerRecipePassthrough:
    def test_fast_recipe_kwargs_reach_generate(self):
        """sampler/quant/layer_cache configured on the server must reach
        every generate_audio call (the quality-validated 36x recipe)."""
        seen = {}

        class Spy(FakeEz):
            def generate_audio(self, texts, random_seed=None, **kw):
                seen.update(kw)
                return super().generate_audio(texts, random_seed=random_seed)

        with GenerationServer(Spy(), max_batch_size=2, max_wait_ms=10,
                              ddim_steps=25, sampler="dpm",
                              guidance_interval=(300, 800),
                              layer_cache=(2, 2), quant="int8") as srv:
            srv.generate("hello", seed=1, timeout=10)
        assert seen["sampler"] == "dpm" and seen["ddim_steps"] == 25
        assert seen["layer_cache"] == (2, 2) and seen["quant"] == "int8"
        assert seen["guidance_interval"] == (300, 800)

    def test_distilled_rejects_schedule_knobs_at_construction(self):
        """distilled + layer_cache/guidance_interval is a config error:
        fail in __init__, not on the first drained batch."""
        with pytest.raises(ValueError, match="distilled"):
            GenerationServer(FakeEz(), sampler="distilled",
                             guidance_interval=(300, 800))
        with pytest.raises(ValueError, match="distilled"):
            GenerationServer(FakeEz(), sampler="distilled",
                             layer_cache=(2, 2))

    def test_real_pipeline_fast_recipe(self):
        """End-to-end through the tiny model with the composed fast recipe."""
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        with GenerationServer(ez, max_batch_size=2, max_wait_ms=50,
                              length=2.0, ddim_steps=8, sampler="dpm",
                              guidance_interval=(300, 800),
                              layer_cache=(1, 2)) as srv:
            futs = [srv.submit(p, seed=i)
                    for i, p in enumerate(["rain", "a dog"])]
            outs = [f.result(timeout=300) for f in futs]
        for sr, wav in outs:
            assert np.isfinite(wav).all() and wav.ndim == 1


class TestServingReviewFixes:
    """Regression tests for the round-2 review findings."""

    def test_pads_never_empty_string(self):
        # "" pads would trip generate_audio's "empty prompt -> CFG off"
        # rule for the whole batch; pads must repeat real prompts
        ez = FakeEz()
        with GenerationServer(ez, max_batch_size=8, max_wait_ms=100,
                              batch_buckets=[4, 8]) as srv:
            futs = [srv.submit(f"x{i}") for i in range(3)]
            [f.result(timeout=10) for f in futs]
        assert all(all(t != "" for t in c) for c in ez.calls)

    def test_bucket_covers_max_batch_size(self):
        # buckets smaller than max_batch_size must not shrink a batch
        ez = FakeEz(delay=0.05)
        with GenerationServer(ez, max_batch_size=3, max_wait_ms=300) as srv:
            futs = [srv.submit(f"p{i}") for i in range(3)]
            res = [f.result(timeout=10) for f in futs]
        assert len(res) == 3
        assert all(len(c) <= 3 for c in ez.calls)
        assert srv.stats["padded_slots"] >= 0

    def test_stop_cancels_queued_requests(self):
        import concurrent.futures

        ez = FakeEz(delay=0.2)
        srv = GenerationServer(ez, max_batch_size=1, max_wait_ms=5).start()
        futs = [srv.submit(f"q{i}") for i in range(20)]
        srv.stop()
        # every future must resolve one way or another — no eternal waiter
        done = 0
        for f in futs:
            try:
                f.result(timeout=5)
                done += 1
            except (concurrent.futures.CancelledError, Exception):
                done += 1
        assert done == 20

    def test_per_request_seed_reproducible_across_batches(self):
        """A (text, seed) pair must reproduce regardless of batch
        composition (deterministic sampler)."""
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        kw = dict(length=2.0, ddim_steps=6, sampler="dpm", max_wait_ms=200)
        with GenerationServer(ez, max_batch_size=2, **kw) as srv:
            f1 = srv.submit("rain", seed=5)
            f2 = srv.submit("a dog", seed=9)
            _, wav_batched = f1.result(timeout=600)
        with GenerationServer(ez, max_batch_size=1, **kw) as srv:
            _, wav_solo = srv.generate("rain", seed=5, timeout=600)
        np.testing.assert_allclose(wav_batched, wav_solo, atol=1e-4)


class TestHeterogeneousServing:
    """Per-request lengths (latent-frame bucketing) + served editing
    (VERDICT r2 item 7)."""

    def test_mixed_lengths_grouped_by_bucket(self):
        class LenSpy(FakeEz):
            def generate_audio(self, texts, random_seed=None, length=None,
                               **kw):
                with self.lock:
                    self.calls.append((length, list(texts)))
                time.sleep(self.delay)
                sr = 24000
                wavs = np.stack([np.zeros(int(length * sr)) for _ in texts])
                return sr, wavs

        ez = LenSpy(delay=0.05)
        with GenerationServer(ez, max_batch_size=8, max_wait_ms=300,
                              length=10.0, length_buckets=[5.0, 10.0]) as srv:
            f5 = [srv.submit(f"s{i}", seed=i, length=4.0) for i in range(2)]
            f10 = [srv.submit(f"l{i}", seed=i, length=10.0) for i in range(2)]
            for f in f5:
                sr, w = f.result(timeout=30)
                assert w.shape == (int(4.0 * sr),)  # trimmed to the request
            for f in f10:
                sr, w = f.result(timeout=30)
                assert w.shape == (int(10.0 * sr),)
        lengths = {c[0] for c in ez.calls}
        # the 4 s requests rounded UP into the 5 s bucket, not 10 s
        assert lengths == {5.0, 10.0}, ez.calls

    def test_mixed_length_seed_reproducible_across_compositions(self):
        """(text, seed, length) must reproduce whether the request shares a
        batch cycle with other lengths or runs alone."""
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        kw = dict(length=2.0, length_buckets=[1.0, 2.0], ddim_steps=6,
                  sampler="dpm", max_wait_ms=300)
        with GenerationServer(ez, max_batch_size=4, **kw) as srv:
            fa = srv.submit("rain", seed=5, length=1.0)
            fb = srv.submit("a dog", seed=9, length=2.0)
            fc = srv.submit("wind", seed=2, length=1.0)
            _, wav_mixed = fa.result(timeout=600)
            fb.result(timeout=600), fc.result(timeout=600)
        with GenerationServer(ez, max_batch_size=1, **kw) as srv:
            _, wav_solo = srv.generate("rain", seed=5, timeout=600,
                                       length=1.0)
        np.testing.assert_allclose(wav_mixed, wav_solo, atol=1e-4)

    def test_served_editing_path(self):
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        _, base = ez.generate_audio("base", length=2, ddim_steps=4,
                                    random_seed=3)
        with GenerationServer(ez, max_batch_size=4, max_wait_ms=200,
                              length=2.0, ddim_steps=4) as srv:
            fe = srv.submit_edit("edit", gt_file=base, boundary=0.25,
                                 mask_start=0.5, mask_length=0.5, seed=7)
            fg = srv.submit("generate too", seed=1)
            sr, edited = fe.result(timeout=600)
            _, gen = fg.result(timeout=600)
        assert edited.shape == base.shape
        assert np.isfinite(edited).all() and np.isfinite(gen).all()
        # matches the direct editing call (same seed, same knobs)
        _, direct = ez.editing_audio("edit", boundary=0.25, gt_file=base,
                                     mask_start=0.5, mask_length=0.5,
                                     ddim_steps=4, random_seed=7)
        np.testing.assert_allclose(edited, direct, atol=1e-5)
        assert srv.stats["edit_requests"] == 1

    def test_served_controlnet_path(self):
        from ezaudio_tpu.api.controlnet import EzAudioControlNet
        from tests.tiny_config import (TINY_CONFIG, TINY_T5, TINY_SR,
                                       TINY_VAE_CONFIG)

        cfg = dict(TINY_CONFIG)
        cfg["controlnet"] = dict(cond_in=1, cond_blocks=[8, 16],
                                 cond_mask=True, cond_mask_prob=0.25,
                                 cond_mask_ratio=[0.25, 0.5],
                                 cond_mask_span=4)
        cfg["conditioner"] = dict(condition_type="energy", hop_size=8,
                                  window_size=64, padding="reflect",
                                  min_db=-60, norm=True)
        cn = EzAudioControlNet(config=cfg, t5_config=TINY_T5,
                               vae_config=TINY_VAE_CONFIG)
        ref = (0.5 * np.sin(2 * np.pi * 55 * np.arange(2 * TINY_SR)
                            / TINY_SR)).astype(np.float32)
        with GenerationServer(cn.base, controlnet=cn, max_batch_size=4,
                              max_wait_ms=200, length=2.0,
                              ddim_steps=4) as srv:
            fc = srv.submit_controlnet("a tone", ref, seed=11, ddim_steps=3)
            fg = srv.submit("generate too", seed=1)
            sr, served = fc.result(timeout=600)
            fg.result(timeout=600)
        assert sr == TINY_SR and served.shape == ref.shape
        assert np.isfinite(served).all()
        # matches the direct ControlNet call (same seed, same knobs)
        _, direct = cn.generate_audio("a tone", ref, ddim_steps=3,
                                      random_seed=11)
        np.testing.assert_allclose(served, direct, atol=1e-5)
        assert srv.stats["controlnet_requests"] == 1
        # a server without controlnet= rejects the submit loudly
        with GenerationServer(cn.base, max_batch_size=1) as srv2:
            with pytest.raises(ValueError, match="controlnet"):
                srv2.submit_controlnet("x", ref)


class TestServedRerank:
    """submit_reranked: best-of-K through the scheduler (fake backend)."""

    def test_served_rerank_path(self):
        class RerankEz(FakeEz):
            def generate_audio_reranked(self, text, scorer, n_candidates=4,
                                        random_seed=None, length=None, **kw):
                with self.lock:
                    self.calls.append(("rerank", text, n_candidates,
                                       random_seed, length))
                return 24000, np.full(16, float(n_candidates))

        ez = RerankEz()
        scorer = object()
        with GenerationServer(ez, max_wait_ms=10,
                              clap_scorer=scorer) as srv:
            sr, wav = srv.submit_reranked(
                "rain", n_candidates=3, seed=7, length=2.0).result(timeout=10)
        assert sr == 24000 and wav[0] == 3.0
        kind, text, k, seed, length = ez.calls[-1]
        assert (kind, text, k, seed, length) == ("rerank", "rain", 3, 7, 2.0)
        assert srv.stats["rerank_requests"] == 1

    def test_rerank_requires_scorer(self):
        with GenerationServer(FakeEz(), max_wait_ms=10) as srv:
            with pytest.raises(ValueError, match="clap_scorer"):
                srv.submit_reranked("x")
