"""MaskDiT / UDiT structural and behavioral tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.models.maskdit import MaskDiT, maskdit_from_config
from ezaudio_tpu.models.span_mask import compute_span_mask

TINY_MODEL = dict(
    mae=True,
    mae_prob=0.25,
    mask_ratio=[0.25, 1.0],
    mask_span=4,
    img_size=32,
    patch_size=1,
    in_chans=17,  # 2*8+1
    out_chans=8,
    input_type="1d",
    embed_dim=64,
    depth=4,
    num_heads=4,
    mlp_ratio=2.0,
    qkv_bias=False,
    qk_scale=None,
    qk_norm="layernorm",
    norm_layer="layernorm",
    act_layer="geglu",
    context_norm=True,
    use_checkpoint=False,
    time_fusion="ada_sola_bias",
    ada_sola_rank=8,
    ada_sola_alpha=8,
    cls_dim=None,
    context_dim=24,
    context_fusion="cross",
    context_max_length=None,
    context_pe_method="none",
    pe_method="none",
    rope_mode="shared",
    use_conv=True,
    skip=True,
    skip_norm=True,
)


@pytest.fixture(scope="module")
def tiny():
    model = maskdit_from_config(TINY_MODEL)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    t = jnp.asarray([10, 500])
    params = model.init({"params": key, "mask": jax.random.PRNGKey(3)},
                        x, t, ctx)
    return model, params, x, ctx, t


class TestMaskDiT:
    def test_generation_forward_shape(self, tiny):
        model, params, x, ctx, t = tiny
        out, mask = model.apply(params, x, t, ctx)
        assert out.shape == (2, 32, 8)
        # pure generation: mask row is all ones
        np.testing.assert_array_equal(np.asarray(mask), np.ones((2, 32, 8)))

    def test_zero_init_heads_make_t_independent_at_init(self, tiny):
        """At init, AdaLN heads are zero -> modulation comes only from the
        (zero) tables; the model output must be identical for any timestep
        (matching the reference's zero-init intent, udit.py:_init_ada)."""
        model, params, x, ctx, t = tiny
        o1, _ = model.apply(params, x, jnp.asarray([7, 7]), ctx)
        o2, _ = model.apply(params, x, jnp.asarray([900, 900]), ctx)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_zero_init_cross_attn_ignores_context_at_init(self, tiny):
        model, params, x, ctx, t = tiny
        o1, _ = model.apply(params, x, t, ctx)
        o2, _ = model.apply(params, x, t, ctx * 100.0)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    def test_context_mask_gates_text(self, tiny):
        """With a non-trivially-trained model proxy (perturbed params),
        masked-out context tokens must not influence the output."""
        model, params, x, ctx, t = tiny
        # perturb cross-attn projections away from zero
        params = jax.tree.map(lambda p: p + 0.01, params)
        cmask = jnp.asarray([[True, True, False, False, False]] * 2)
        o1, _ = model.apply(params, x, t, ctx, context_mask=cmask)
        ctx2 = ctx.at[:, 2:].set(999.0)
        o2, _ = model.apply(params, x, t, ctx2, context_mask=cmask)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    def test_editing_mask_infer(self, tiny):
        model, params, x, ctx, t = tiny
        gt = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 8))
        infer_mask = jnp.zeros((2, 32, 1), dtype=bool).at[:, 8:16].set(True)
        out, mask = model.apply(params, x, t, ctx, gt=gt, mae_mask_infer=infer_mask)
        assert out.shape == (2, 32, 8)
        m = np.asarray(mask)
        assert m[:, 8:16].all() and not m[:, :8].any() and not m[:, 16:].any()

    def test_training_masking(self, tiny):
        model, params, x, ctx, t = tiny
        gt = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 8))
        out, mask = model.apply(
            params, x, t, ctx, gt=gt, train=True,
            rngs={"mask": jax.random.PRNGKey(4)},
        )
        m = np.asarray(mask)
        assert out.shape == (2, 32, 8)
        # mask is binary and channel-constant
        assert set(np.unique(m)).issubset({0.0, 1.0})
        assert (m.std(axis=2) == 0).all()
        # masking is non-trivial: some positions masked in each sample
        assert (m[:, :, 0].sum(axis=1) >= 1).all()

    def test_forward_model_false_returns_concat(self, tiny):
        model, params, x, ctx, t = tiny
        concat, mask = model.apply(params, x, t, ctx, forward_model=False)
        assert concat.shape == (2, 32, 17)
        # layout: [x | gt | mask_row]
        np.testing.assert_allclose(np.asarray(concat[..., :8]), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(concat[..., -1]), 1.0)

    def test_jit_and_grad(self, tiny):
        model, params, x, ctx, t = tiny

        @jax.jit
        def loss_fn(p):
            out, _ = model.apply(p, x, t, ctx)
            return jnp.mean(out**2)

        g = jax.grad(loss_fn)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(v)).all() for v in flat)


class TestSpanMask:
    def test_mask_statistics_match_reference_distribution(self):
        """Masked-fraction statistics must match the host NumPy algorithm
        (span_mask.py:6-130) within Monte-Carlo tolerance."""
        B, L, span = 256, 500, 10
        probs = np.full((B,), 0.65, dtype=np.float32)
        key = jax.random.PRNGKey(0)
        mask = np.asarray(compute_span_mask(key, B, L, jnp.asarray(probs), span))
        frac = mask.mean()

        # Reference-style NumPy simulation (re-derived, not copied):
        rs = np.random.default_rng(0)
        fracs = []
        for _ in range(B):
            num = max(1, int(0.65 * L / span + rs.random()))
            starts = rs.choice(L - span, num, replace=False)
            m = np.zeros(L, bool)
            for s in starts:
                m[s : s + span] = True
            fracs.append(m.mean())
        ref_frac = np.mean(fracs)
        assert abs(frac - ref_frac) < 0.03, (frac, ref_frac)

    def test_min_masks(self):
        mask = np.asarray(
            compute_span_mask(jax.random.PRNGKey(1), 64, 100, jnp.zeros(64), 10)
        )
        # min_masks=1 guarantees at least one span even at p=0
        assert (mask.sum(axis=1) >= 10).all()


class TestAlternativeUDiTModes:
    """Exercise the reference's non-default architecture switches
    (udit.py time_fusion='token', context_fusion='concat', abs/sinu PEs,
    rope x_only/dual) — present in the reference even though the published
    configs use ada_sola_bias/cross/none/shared."""

    def _run(self, **kw):
        from ezaudio_tpu.models.udit import UDiT

        base = dict(img_size=16, patch_size=1, in_chans=4, out_chans=4,
                    embed_dim=32, depth=2, num_heads=4, context_dim=8,
                    context_fusion="concat", context_max_length=5,
                    context_pe_method="sinu", pe_method="abs",
                    time_fusion="token", qk_norm=None, act_layer="gelu",
                    rope_mode="none", skip=True, use_conv=True,
                    use_checkpoint=False)
        base.update(kw)
        m = UDiT(**base)
        key = jax.random.PRNGKey(0)
        p = m.init(key, jnp.zeros((2, 16, 4)), jnp.zeros((2,), jnp.int32),
                   jnp.zeros((2, 5, 8)))
        out = m.apply(p, jnp.ones((2, 16, 4)), jnp.asarray([3, 9]),
                      jnp.zeros((2, 5, 8)))
        assert out.shape == (2, 16, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_token_concat_abs_sinu(self):
        self._run()

    def test_rope_x_only(self):
        self._run(context_pe_method="none", pe_method="none",
                  rope_mode="x_only", act_layer="geglu", skip=False,
                  use_conv=False)

    def test_rope_dual(self):
        self._run(context_pe_method="none", pe_method="none",
                  rope_mode="dual")

    def test_ada_single(self):
        self._run(time_fusion="ada_single", context_fusion="cross",
                  qk_norm="rmsnorm", norm_layer="rmsnorm")

    def test_snake_ff(self):
        self._run(act_layer="gesnake")


class TestUDiT2D:
    def test_2d_forward(self):
        """2D spectrogram-latent variant (reference input_type='2d' path)."""
        from ezaudio_tpu.models.udit import UDiT

        m = UDiT(img_size=(8, 16), patch_size=4, in_chans=3, out_chans=3,
                 input_type="2d", embed_dim=32, depth=2, num_heads=4,
                 context_dim=8, context_fusion="cross",
                 context_pe_method="none", pe_method="abs",
                 time_fusion="ada_single", qk_norm=None, act_layer="geglu",
                 rope_mode="none", skip=True, use_conv=True,
                 use_checkpoint=False)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 16, 3))
        ctx = jax.random.normal(key, (2, 5, 8))
        p = m.init(key, x, jnp.zeros((2,), jnp.int32), ctx)
        out = m.apply(p, x, jnp.asarray([3, 9]), ctx)
        assert out.shape == (2, 8, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestFusedQKV:
    def test_fused_matches_split(self, tiny):
        """fused_qkv=True consumes the same param tree and must produce
        identical outputs."""
        from ezaudio_tpu.models.maskdit import MaskDiT, maskdit_from_config

        model, params, x, ctx, t = tiny
        fused_cfg = dict(TINY_MODEL)
        fused = MaskDiT(
            mae=True, mae_prob=0.25, mask_ratio=(0.25, 1.0), mask_span=4,
            udit={k: v for k, v in fused_cfg.items()
                  if k not in ("mae", "mae_prob", "mask_ratio", "mask_span",
                               "input_type")})
        # monkey-level: rebuild with fused attention via module tree override
        import ezaudio_tpu.models.blocks as blocks_mod

        orig = blocks_mod.Attention.fused_qkv
        blocks_mod.Attention.fused_qkv = True
        try:
            out_f, _ = fused.apply(params, x, t, ctx)
        finally:
            blocks_mod.Attention.fused_qkv = orig
        out_s, _ = model.apply(params, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   atol=2e-5)


class TestReviewRegressionsR2:
    """Regression tests for the round-2 high-effort review findings."""

    def test_span_mask_short_sequence_traces(self):
        """length within max_spans of mask_length used to crash top_k
        (k > score-axis size); now max_spans clamps to the start count."""
        from ezaudio_tpu.models.span_mask import compute_span_mask

        for L in (10, 11, 12, 15):
            mask = np.asarray(compute_span_mask(
                jax.random.PRNGKey(0), 4, L, jnp.full((4,), 0.5), 10))
            assert mask.shape == (4, L)
            assert (mask.sum(axis=1) >= 1).all()  # min_masks honored

    def test_frame_energy_odd_window_hop(self):
        """Odd (window - hop): the last frame's window must not be
        truncated by the symmetric //2 pad (cumsum path)."""
        from ezaudio_tpu.models.conditioners import frame_energy

        rng = np.random.default_rng(0)
        hop, window = 8, 13
        x = rng.standard_normal((2, 64)).astype(np.float32)
        got = np.asarray(frame_energy(jnp.asarray(x), hop, window,
                                      padding="constant"))
        pad_l = (window - hop) // 2
        pad_r = (window - hop) - pad_l
        xp = np.pad(x, ((0, 0), (pad_l, pad_r)))
        n = x.shape[1] // hop
        want = np.stack([
            np.square(xp[:, i * hop : i * hop + window]).mean(axis=1)
            for i in range(n)], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_conditioner_2d_tiling_matches_reference_factor(self):
        """condition_wrapper.py:33-36: the F-axis replication factor is
        X = F_lat * cond_T / T_lat, not F_lat."""
        from ezaudio_tpu.models.conditioners import Conditioner

        cond = Conditioner("energy", hop_size=8, window_size=16,
                           padding="constant", norm=False)
        wav = np.random.default_rng(1).standard_normal((2, 320)).astype(np.float32)
        T_cond = 320 // 8          # 40 condition frames
        T_lat, F_lat = 20, 4       # cond at 2x the latent frame rate
        out = cond(wav, latent_shape=(2, T_lat, F_lat, 8))
        X = F_lat * T_cond // T_lat
        assert out.shape == (2, T_cond, X, 1), out.shape

    def test_udit_concat_rejects_short_context(self):
        from ezaudio_tpu.models.udit import UDiT

        m = UDiT(img_size=16, patch_size=1, in_chans=4, out_chans=4,
                 embed_dim=32, depth=2, num_heads=4, context_dim=8,
                 context_fusion="concat", context_max_length=5,
                 time_fusion="token", use_checkpoint=False)
        with pytest.raises(AssertionError, match="context_max_length"):
            m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 4)),
                   jnp.zeros((2,), jnp.int32), jnp.zeros((2, 3, 8)))

    def test_controlnet_concat_fusion_masks(self):
        """ControlNet's concat-fusion path must extend the key mask with
        the context prefix (used to crash with x_mask, and silently
        attend to padded context without it)."""
        from ezaudio_tpu.models.controlnet import DiTControlNet

        model_cfg = dict(img_size=16, patch_size=1, in_chans=9, out_chans=4,
                         embed_dim=32, depth=2, num_heads=4, context_dim=8,
                         context_fusion="concat", context_max_length=5,
                         time_fusion="ada_single", use_checkpoint=False)
        cn = DiTControlNet(udit=model_cfg, cond_in=1, cond_blocks=(1,),
                           cond_mask=False)
        x = jnp.zeros((2, 16, 9))
        ctx = jnp.zeros((2, 5, 8))
        cond = jnp.zeros((2, 16, 1))
        cmask = jnp.ones((2, 5), bool).at[:, 3:].set(False)
        xmask = jnp.ones((2, 16), bool)
        v = cn.init({"params": jax.random.PRNGKey(0)}, x,
                    jnp.zeros((2,), jnp.int32), ctx, x_mask=xmask,
                    context_mask=cmask, condition=cond)
        skips = cn.apply(v, x, jnp.zeros((2,), jnp.int32), ctx,
                         x_mask=xmask, context_mask=cmask, condition=cond)
        assert len(skips) == 1
        assert np.isfinite(np.asarray(skips[0])).all()

    def test_flow_loss_uses_caller_schedule(self):
        from ezaudio_tpu.diffusion.flow import FlowSchedule, flow_matching_loss

        seen = []

        def apply_fn(params, xt, t_scaled, rngs=None):
            seen.append(float(np.asarray(t_scaled)[0]))
            return jnp.zeros_like(xt), jnp.ones_like(xt)

        x0 = jnp.zeros((1, 8, 2))
        noise = jnp.ones((1, 8, 2))
        t = jnp.asarray([0.5])
        flow_matching_loss(apply_fn, None, x0, noise, t,
                           schedule=FlowSchedule(num_train_timesteps=500))
        assert seen[-1] == 250.0  # 0.5 * 500, not 0.5 * 1000
