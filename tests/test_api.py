"""End-to-end API integration tests on the tiny config (random weights).

Mirrors the reference's north-star call paths (SURVEY.md §3.1/§3.2):
generate -> DDIM scan with CFG -> VAE decode; editing with boundary window
and latent masking; batched multi-prompt generation.
"""

import numpy as np
import pytest

from tests.tiny_config import TINY_LATENT_SR, TINY_SR, make_tiny_ezaudio


@pytest.fixture(scope="module")
def ez():
    return make_tiny_ezaudio()


class TestGenerate:
    def test_generate_audio(self, ez):
        sr, wav = ez.generate_audio("a dog barking", length=2, ddim_steps=4,
                                    random_seed=0)
        assert sr == TINY_SR
        assert wav.shape == (2 * TINY_SR,)
        assert np.isfinite(wav).all()

    def test_deterministic_given_seed(self, ez):
        _, w1 = ez.generate_audio("rain", length=2, ddim_steps=4, random_seed=7)
        _, w2 = ez.generate_audio("rain", length=2, ddim_steps=4, random_seed=7)
        np.testing.assert_array_equal(w1, w2)

    def test_seed_changes_output(self, ez):
        _, w1 = ez.generate_audio("rain", length=2, ddim_steps=4, random_seed=1)
        _, w2 = ez.generate_audio("rain", length=2, ddim_steps=4, random_seed=2)
        assert np.abs(w1 - w2).max() > 1e-6

    def test_batched_prompts(self, ez):
        sr, wav = ez.generate_audio(["a dog", "rain falling"], length=2,
                                    ddim_steps=4, random_seed=0)
        assert wav.shape == (2, 2 * TINY_SR)

    def test_empty_prompt_disables_guidance(self, ez):
        sr, wav = ez.generate_audio("", length=2, ddim_steps=4, random_seed=0)
        assert wav.shape == (2 * TINY_SR,)

    def test_no_guidance_path(self, ez):
        sr, wav = ez.generate_audio("a dog", length=2, ddim_steps=4,
                                    guidance_scale=None, random_seed=0)
        assert wav.shape == (2 * TINY_SR,)


class TestEditing:
    def test_inpainting_preserves_context(self, ez, rng):
        gt = (0.5 * np.sin(2 * np.pi * 110 * np.arange(2 * TINY_SR) / TINY_SR)).astype(np.float32)
        sr, out = ez.editing_audio("a dog", boundary=0.25, gt_file=gt,
                                   mask_start=0.5, mask_length=0.5,
                                   ddim_steps=4, random_seed=0)
        assert sr == TINY_SR
        assert out.shape == gt.shape
        # outside the edit window the waveform is untouched
        norm = gt / (np.max(np.abs(gt)) + 1e-9)
        np.testing.assert_array_equal(out[: int(0.2 * TINY_SR)], norm[: int(0.2 * TINY_SR)])
        np.testing.assert_array_equal(out[int(1.3 * TINY_SR):], norm[int(1.3 * TINY_SR):])

    def test_crossfade_keeps_context_and_changes_paste(self, ez):
        """crossfade>0 must (a) leave the out-of-window waveform untouched
        (the blend weight is 0 outside the mask), (b) differ from the hard
        paste only near the mask edges, and (c) be deterministic."""
        gt = (0.5 * np.sin(2 * np.pi * 110 * np.arange(2 * TINY_SR)
                           / TINY_SR)).astype(np.float32)
        kw = dict(boundary=0.25, gt_file=gt, mask_start=0.5,
                  mask_length=0.5, ddim_steps=4, random_seed=0)
        _, hard = ez.editing_audio("a dog", **kw)
        _, soft = ez.editing_audio("a dog", crossfade=0.2, **kw)
        _, soft2 = ez.editing_audio("a dog", crossfade=0.2, **kw)
        np.testing.assert_array_equal(soft, soft2)
        norm = gt / (np.max(np.abs(gt)) + 1e-9)
        np.testing.assert_array_equal(soft[: int(0.2 * TINY_SR)],
                                      norm[: int(0.2 * TINY_SR)])
        np.testing.assert_array_equal(soft[int(1.3 * TINY_SR):],
                                      norm[int(1.3 * TINY_SR):])
        # the blend changed something inside the window
        assert np.abs(soft - hard).max() > 1e-6

    def test_outpainting_extends(self, ez):
        gt = (0.1 * np.random.default_rng(0).standard_normal(TINY_SR)).astype(np.float32)
        sr, out = ez.editing_audio("wind", boundary=0.25, gt_file=gt,
                                   mask_start=1.0, mask_length=1.0,
                                   ddim_steps=4, random_seed=0)
        assert len(out) == 2 * TINY_SR  # extended by the outpaint


class TestJitCache:
    def test_sampler_cache_reuse(self, ez):
        f1 = ez._sampler(4, 5.0, 0.75, 1.0, False)
        f2 = ez._sampler(4, 5.0, 0.75, 1.0, False)
        assert f1 is f2


class TestAttnImplKnob:
    """Per-call attention-impl acceleration knob (probe11/BASELINE.md):
    chunked_bf16 is the quality-validated fast path; it must stay close to
    the einsum-f32 default and key its own jit cache entry."""

    def test_chunked_bf16_close_to_default(self, ez):
        _, w_ref = ez.generate_audio("rain", length=2, ddim_steps=4,
                                     random_seed=5)
        _, w_fast = ez.generate_audio("rain", length=2, ddim_steps=4,
                                      random_seed=5, attn_impl="chunked_bf16")
        assert w_fast.shape == w_ref.shape
        assert np.isfinite(w_fast).all()
        # bf16 softmax: small per-step deviation; exact 'chunked' (f32)
        # must match the einsum default to float tolerance
        _, w_chunk = ez.generate_audio("rain", length=2, ddim_steps=4,
                                       random_seed=5, attn_impl="chunked")
        np.testing.assert_allclose(w_chunk, w_ref, atol=2e-4)

    def test_attn_impl_is_part_of_cache_key(self, ez):
        f_ref = ez._sampler(4, 5.0, 0.75, 1.0, False, None, "ddim", None,
                            None, None)
        f_fast = ez._sampler(4, 5.0, 0.75, 1.0, False, None, "ddim", None,
                             None, "chunked_bf16")
        assert f_ref is not f_fast


class TestGuidanceInterval:
    def test_full_interval_matches_plain_cfg(self, ez):
        _, w_plain = ez.generate_audio("rain", length=2, ddim_steps=4,
                                       random_seed=3)
        _, w_full = ez.generate_audio("rain", length=2, ddim_steps=4,
                                      random_seed=3,
                                      guidance_interval=(0, 1000))
        np.testing.assert_allclose(w_full, w_plain, atol=1e-5)

    def test_band_interval_runs_and_differs(self, ez):
        _, w_plain = ez.generate_audio("rain", length=2, ddim_steps=8,
                                       random_seed=3)
        _, w_band = ez.generate_audio("rain", length=2, ddim_steps=8,
                                      random_seed=3,
                                      guidance_interval=(200, 800))
        assert w_band.shape == w_plain.shape
        assert np.isfinite(w_band).all()

    def test_composes_with_dpm_and_layer_cache(self, ez):
        """The fast-recipe composition: DPM + layer_cache + a CFG band.
        The band must actually engage (dpm used to silently drop it).
        The fresh tiny model is CFG-insensitive (zero-init AdaLN heads ->
        cond == uncond), so perturb the DiT params for the difference
        assertions and restore them afterwards."""
        import jax

        orig = ez.dit_params
        leaves, treedef = jax.tree.flatten(orig)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        ez.dit_params = jax.tree.unflatten(treedef, [
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        try:
            kw = dict(length=2, ddim_steps=8, random_seed=3, sampler="dpm",
                      layer_cache=(1, 2))
            _, w_plain = ez.generate_audio("rain", **kw)
            _, w_band = ez.generate_audio(
                "rain", guidance_interval=(300, 800), **kw)
            assert np.isfinite(w_band).all()
            assert np.abs(w_band - w_plain).max() > 1e-6
            # full band == no band, and plain dpm engages the interval too
            _, w_full = ez.generate_audio(
                "rain", guidance_interval=(0, 1000), **kw)
            np.testing.assert_allclose(w_full, w_plain, atol=1e-5)
            _, d_plain = ez.generate_audio("rain", length=2, ddim_steps=8,
                                           random_seed=3, sampler="dpm")
            _, d_band = ez.generate_audio("rain", length=2, ddim_steps=8,
                                          random_seed=3, sampler="dpm",
                                          guidance_interval=(300, 800))
            assert np.abs(d_band - d_plain).max() > 1e-6
        finally:
            ez.dit_params = orig


class TestLengthExtension:
    """RoPE 'shared' makes the DiT length-extensible (rotary.py caching in
    the reference; trace-time tables here): generation beyond the training
    img_size works without architecture changes — a capability the
    reference only reaches via chained outpainting."""

    def test_longer_than_img_size(self, ez):
        # tiny img_size is 100 latent frames (2 s); generate 4 s
        sr, wav = ez.generate_audio("wind", length=4, ddim_steps=2,
                                    random_seed=0)
        assert wav.shape == (4 * TINY_SR,)
        assert np.isfinite(wav).all()

    def test_shorter_clip(self, ez):
        sr, wav = ez.generate_audio("wind", length=1, ddim_steps=2,
                                    random_seed=0)
        assert wav.shape == (1 * TINY_SR,)


class TestDPMSamplerOption:
    def test_dpm_generate(self, ez):
        sr, wav = ez.generate_audio("rain", length=2, ddim_steps=6,
                                    random_seed=1, sampler="dpm")
        assert wav.shape == (2 * TINY_SR,)
        assert np.isfinite(wav).all()

    def test_dpm_differs_from_ddim(self, ez):
        _, a = ez.generate_audio("rain", length=2, ddim_steps=6,
                                 random_seed=1, sampler="dpm")
        _, b = ez.generate_audio("rain", length=2, ddim_steps=6,
                                 random_seed=1, sampler="ddim")
        assert np.abs(a - b).max() > 1e-6


class TestCfgRefresh:
    def test_fresh_model_matches_pair(self, ez):
        """The fresh tiny model is CFG-insensitive (zero-init AdaLN heads
        -> cond == uncond -> zero guidance delta), so cfg_refresh=2 must
        reproduce the standard pair through the public API, with and
        without layer caching."""
        kw = dict(length=2, ddim_steps=8, random_seed=3, sampler="dpm",
                  guidance_interval=(300, 800))
        _, a = ez.generate_audio("rain", **kw)
        _, b = ez.generate_audio("rain", cfg_refresh=2, **kw)
        np.testing.assert_allclose(a, b, atol=1e-5)
        kw["layer_cache"] = (1, 2)
        _, a = ez.generate_audio("rain", **kw)
        _, b = ez.generate_audio("rain", cfg_refresh=2, **kw)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_requires_dpm(self, ez):
        with pytest.raises(ValueError, match="cfg_refresh"):
            ez.generate_audio("rain", length=2, ddim_steps=4,
                              cfg_refresh=2)


class TestGenerateLong:
    def test_long_generation_by_outpainting(self, ez):
        """Generate 5 s with a 2 s window at tiny scale (chained
        outpainting)."""
        sr, wav = ez.generate_long("wind", length=5, window=2, overlap=0.5,
                                   ddim_steps=2, random_seed=0)
        assert sr == TINY_SR
        assert wav.shape == (5 * TINY_SR,)
        assert np.isfinite(wav).all()
        # the extension regions are non-silent
        assert np.abs(wav[3 * TINY_SR:]).max() > 1e-4


class TestHFTokenizerPath:
    """VERDICT r1 weak #5: the full text -> real-token-ids -> embedding ->
    audio path.  No flan-t5 tokenizer.json ships in this image, so a valid
    HF-fast tokenizer.json with T5 id conventions (pad=0, eos=1 appended by
    a post-processor) is built with the installed `tokenizers` library and
    the whole pipeline runs through HFTokenizerFrontend."""

    @pytest.fixture(scope="class")
    def tok_json(self, tmp_path_factory):
        from tokenizers import Tokenizer, models, pre_tokenizers, processors

        vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
        for w in ("a", "dog", "barking", "in", "the", "rain", "birds",
                  "chirping", "forest", "car", "engine"):
            vocab[w] = len(vocab)
        tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        tok.post_processor = processors.TemplateProcessing(
            single="$A </s>", special_tokens=[("</s>", 1)])
        path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
        tok.save(str(path))
        return str(path)

    def test_frontend_ids_and_mask(self, tok_json):
        from ezaudio_tpu.text.tokenizer import HFTokenizerFrontend, get_tokenizer

        tok = get_tokenizer(tok_json)
        assert isinstance(tok, HFTokenizerFrontend)
        ids, mask = tok(["a dog barking", "rain"], max_length=6)
        assert ids.shape == (2, 6) and mask.shape == (2, 6)
        # eos appended, pad=0 after, mask matches
        assert ids[0, 3] == 1 and ids[0, 4] == 0
        assert mask[0, :4].all() and not mask[0, 4:].any()
        assert ids[1, 1] == 1 and mask[1, :2].all()

    def test_generate_through_real_tokenizer(self, tok_json):
        from ezaudio_tpu.api.ezaudio import EzAudio
        from tests.tiny_config import TINY_CONFIG, TINY_VAE_CONFIG, TINY_T5

        ez = EzAudio(config=TINY_CONFIG, vae_config=TINY_VAE_CONFIG,
                     t5_config=TINY_T5, tokenizer_path=tok_json)
        sr, wav = ez.generate_audio(["a dog barking in the rain",
                                     "birds chirping in the forest"],
                                    length=1.0, ddim_steps=4, random_seed=0)
        assert wav.shape == (2, sr)
        assert np.isfinite(wav).all()
        # different prompts through real ids -> different audio
        assert np.abs(wav[0] - wav[1]).max() > 1e-6


class TestMixedBatchCFG:
    def test_mixed_empty_prompt_keeps_cfg(self):
        """One empty prompt in a batch must not silently disable CFG for
        the other prompts (empty cond == uncond, so that item reduces to
        the unguided sample on its own)."""
        from tests.tiny_config import make_tiny_ezaudio

        ez = make_tiny_ezaudio()
        sr, wavs = ez.generate_audio(["rain", ""], length=2.0, ddim_steps=4,
                                     guidance_scale=3.0, random_seed=0)
        assert wavs.shape[0] == 2 and np.isfinite(wavs).all()
        # all-empty: the reference's no-CFG path
        sr, wavs = ez.generate_audio(["", ""], length=2.0, ddim_steps=4,
                                     guidance_scale=3.0, random_seed=0)
        assert wavs.shape[0] == 2 and np.isfinite(wavs).all()

    def test_per_instance_sampler_cache(self):
        """The jit/sampler caches must be per-instance (a class-level
        lru_cache would pin instances and their params forever)."""
        from ezaudio_tpu.api.ezaudio import EzAudio

        assert "_sampler" not in EzAudio.__dict__  # bound per instance
        assert not hasattr(EzAudio.__dict__.get("_sampler_impl"),
                           "cache_info")
        assert not hasattr(EzAudio.__dict__.get("_uncond_embedding_impl"),
                           "cache_info")


class TestMeshAPI:
    """Multi-chip inference through the PUBLIC API (VERDICT r2 item 1):
    the prompt batch + CFG pair shard over dp on an 8-virtual-device mesh
    and the result equals the single-device output."""

    @pytest.fixture(scope="class")
    def mesh_ez(self):
        import jax

        from ezaudio_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=8, devices=jax.devices()[:8])
        return make_tiny_ezaudio(mesh=mesh)

    def test_divisible_batch_equals_single_device(self, ez, mesh_ez):
        prompts = [f"sound number {i}" for i in range(8)]
        _, w0 = ez.generate_audio(prompts, length=2, ddim_steps=4,
                                  random_seed=7)
        _, w1 = mesh_ez.generate_audio(prompts, length=2, ddim_steps=4,
                                       random_seed=7)
        np.testing.assert_allclose(w1, w0, atol=1e-5)

    def test_padded_batch_equals_single_device(self, ez, mesh_ez):
        # 5 prompts on 8 devices: internal pad to 8, noise drawn at the
        # request batch so the draw matches the solo call exactly
        prompts = [f"sound number {i}" for i in range(5)]
        _, w0 = ez.generate_audio(prompts, length=2, ddim_steps=4,
                                  random_seed=7)
        _, w1 = mesh_ez.generate_audio(prompts, length=2, ddim_steps=4,
                                       random_seed=7)
        assert w1.shape == w0.shape == (5, 2 * TINY_SR)
        np.testing.assert_allclose(w1, w0, atol=1e-5)

    def test_single_prompt_on_mesh(self, mesh_ez):
        sr, wav = mesh_ez.generate_audio("one prompt", length=2,
                                         ddim_steps=4, random_seed=1)
        assert wav.shape == (2 * TINY_SR,)
        assert np.isfinite(wav).all()

    def test_editing_on_mesh(self, ez, mesh_ez):
        _, base = mesh_ez.generate_audio("base", length=2, ddim_steps=4,
                                         random_seed=3)
        _, e0 = ez.editing_audio("edit", boundary=0.25, gt_file=base,
                                 mask_start=0.5, mask_length=0.5,
                                 ddim_steps=4, random_seed=5)
        _, e1 = mesh_ez.editing_audio("edit", boundary=0.25, gt_file=base,
                                      mask_start=0.5, mask_length=0.5,
                                      ddim_steps=4, random_seed=5)
        np.testing.assert_allclose(e1, e0, atol=1e-5)

    def test_server_drains_onto_mesh(self, mesh_ez):
        from ezaudio_tpu.serving import GenerationServer

        with GenerationServer(mesh_ez, max_batch_size=8, length=2,
                              ddim_steps=4) as srv:
            # buckets aligned to the dp world
            assert all(b % 8 == 0 for b in srv.buckets), srv.buckets
            futs = [srv.submit(f"req {i}", seed=i) for i in range(3)]
            for f in futs:
                sr, w = f.result(timeout=300)
                assert np.isfinite(w).all()

    def test_fused_on_mesh_equals_single_device(self, ez, mesh_ez):
        """The padded fused program (Bp=8 from 2 prompts) shards over dp
        and reproduces the single-device fused output."""
        _, wm = mesh_ez.generate_audio(["a", "b"], length=2, ddim_steps=3,
                                       random_seed=2, fused=True)
        _, ws = ez.generate_audio(["a", "b"], length=2, ddim_steps=3,
                                  random_seed=2, fused=True)
        np.testing.assert_allclose(wm, ws, atol=1e-5)


@pytest.mark.heavy
class TestFusedPath:
    """The single-dispatch fused program (T5 -> sampler -> VAE in one jit)
    must be sample-exact vs the staged path for every recipe knob.
    ``heavy``: each recipe compiles a full fused pipeline program."""

    RECIPES = [
        dict(ddim_steps=4, random_seed=3),                       # ddim+CFG
        dict(ddim_steps=4, random_seed=3, sampler="dpm",
             layer_cache=(1, 2)),                                # fast recipe
        dict(ddim_steps=3, random_seed=5, guidance_scale=None),  # CFG off
        dict(ddim_steps=3, random_seed=5,
             attn_impl="chunked_bf16"),                          # bf16 attn
        dict(ddim_steps=3, random_seed=5,
             guidance_interval=(100, 900)),                      # interval
        dict(ddim_steps=8, random_seed=5, sampler="dpm",
             layer_cache=(1, 2),
             guidance_interval=(300, 800)),        # fast recipe + interval
    ]

    @pytest.mark.parametrize("kw", RECIPES,
                             ids=[str(sorted(r)) for r in RECIPES])
    def test_fused_equals_staged(self, ez, kw):
        _, wf = ez.generate_audio(["rain", "a dog"], length=2, fused=True,
                                  **kw)
        _, wu = ez.generate_audio(["rain", "a dog"], length=2, fused=False,
                                  **kw)
        if "guidance_interval" in kw:
            # the interval path's segment boundaries fuse differently
            # inside one program — f32-ulp-level differences only
            np.testing.assert_allclose(wf, wu, atol=2e-6)
        else:
            np.testing.assert_array_equal(wf, wu)

    def test_fused_chunked_decode(self, ez):
        """batch > decode chunk exercises the in-graph lax.map decode."""
        texts = [f"p{i}" for i in range(6)]
        _, wf = ez.generate_audio(texts, length=2, ddim_steps=3,
                                  random_seed=2, fused=True)
        _, wu = ez.generate_audio(texts, length=2, ddim_steps=3,
                                  random_seed=2, fused=False)
        np.testing.assert_array_equal(wf, wu)

    def test_distilled_sampler_served(self, ez):
        """sampler='distilled' (serving path for progressively-distilled
        students): no CFG pair, student-grid DDIM, fused == staged."""
        kw = dict(length=2, ddim_steps=4, sampler="distilled", random_seed=3)
        _, w = ez.generate_audio(["rain", "a dog"], **kw)
        assert w.shape == (2, 2 * TINY_SR) and np.isfinite(w).all()
        _, wf = ez.generate_audio(["rain", "a dog"], fused=True, **kw)
        np.testing.assert_array_equal(wf, w)
        # distinct grid / no CFG: not the ddim output
        _, wd = ez.generate_audio(["rain", "a dog"], length=2, ddim_steps=4,
                                  random_seed=3)
        assert np.abs(wd - w).max() > 1e-6
        with pytest.raises(AssertionError, match="distilled"):
            ez.generate_audio("x", length=2, ddim_steps=4,
                              sampler="distilled", layer_cache=(1, 2))

    def test_fused_initial_latents_and_int8(self, ez, monkeypatch):
        import ezaudio_tpu.ops.quant as qm

        rng = np.random.default_rng(0)
        lat = rng.standard_normal(
            (2, 2 * TINY_LATENT_SR, ez.latent_dim)).astype(np.float32)
        kw = dict(length=2, ddim_steps=3, random_seed=1,
                  initial_latents=lat)
        monkeypatch.setattr(qm, "MIN_QUANT_ELEMENTS", 0)
        try:
            _, wf = ez.generate_audio(["a", "b"], fused=True, quant="int8",
                                      **kw)
            _, wu = ez.generate_audio(["a", "b"], fused=False, quant="int8",
                                      **kw)
        finally:
            # programs traced with the patched threshold must not leak
            # into the module-scoped instance's jit caches (the lru keys
            # don't include MIN_QUANT_ELEMENTS)
            ez._fused.cache_clear()
            ez._sampler.cache_clear()
        np.testing.assert_array_equal(wf, wu)


class _StubScorer:
    """Duck-typed CLAPScorer double: deterministic embeddings derived from
    the inputs, so the rerank test can assert the selection math without a
    full (fixed-geometry) CLAP tower.  embed_audio keys on waveform energy;
    embed_text keys on prompt length — both 2-d unit vectors."""

    def __init__(self):
        self.audio_calls = 0
        self.text_calls = 0

    @staticmethod
    def _unit(v):
        v = np.stack([np.cos(v), np.sin(v)], axis=-1)
        return v.astype(np.float32)

    def embed_audio(self, wav, sr):
        self.audio_calls += 1
        wav = np.asarray(wav)
        return self._unit(np.sqrt((wav**2).mean(axis=-1)) * 50)

    def embed_text(self, texts):
        self.text_calls += 1
        return self._unit(np.asarray([float(len(t)) for t in texts]))


class TestClapRerank:
    """generate_audio_reranked: the reference's empty clap_wrapper.py seam,
    filled (best-of-K by CLAP score)."""

    def test_selects_argmax_per_prompt(self, ez):
        scorer = _StubScorer()
        prompts = ["rain", "a dog barking"]
        sr, best, allw, scores = ez.generate_audio_reranked(
            prompts, scorer, n_candidates=3, return_all=True,
            length=2, ddim_steps=3, random_seed=11)
        assert sr == TINY_SR
        assert best.shape == (2, 2 * TINY_SR)
        assert allw.shape == (2, 3, 2 * TINY_SR)
        assert scores.shape == (2, 3)
        # candidates are genuinely distinct draws
        assert np.abs(allw[:, 0] - allw[:, 1]).max() > 1e-6
        # the returned waveform IS the per-prompt argmax candidate
        for b in range(2):
            np.testing.assert_array_equal(best[b], allw[b, scores[b].argmax()])
        # prompts embedded once (B texts), audio once (B*K batch)
        assert scorer.text_calls == 1 and scorer.audio_calls == 1

    def test_reproducible_and_single_prompt(self, ez):
        scorer = _StubScorer()
        kw = dict(length=2, ddim_steps=3, random_seed=5)
        _, b1 = ez.generate_audio_reranked("rain", scorer, n_candidates=2, **kw)
        _, b2 = ez.generate_audio_reranked("rain", scorer, n_candidates=2, **kw)
        assert b1.shape == (2 * TINY_SR,)
        np.testing.assert_array_equal(b1, b2)
