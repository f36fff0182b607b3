"""Micro-batching generation server tests (fake backend)."""

import threading
import time

import numpy as np

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
                              layer_cache=(2, 2), quant="int8") as srv:
            srv.generate("hello", seed=1, timeout=10)
        assert seen["sampler"] == "dpm" and seen["ddim_steps"] == 25
        assert seen["layer_cache"] == (2, 2) and seen["quant"] == "int8"

    def test_real_pipeline_fast_recipe(self):
        """End-to-end through the tiny model with the composed fast recipe."""
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        with GenerationServer(ez, max_batch_size=2, max_wait_ms=50,
                              length=2.0, ddim_steps=8, sampler="dpm",
                              layer_cache=(1, 2)) as srv:
            futs = [srv.submit(p, seed=i)
                    for i, p in enumerate(["rain", "a dog"])]
            outs = [f.result(timeout=300) for f in futs]
        for sr, wav in outs:
            assert np.isfinite(wav).all() and wav.ndim == 1
