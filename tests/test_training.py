"""Training step + multi-device DP tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.diffusion.ddim import DDIMSchedule
from ezaudio_tpu.models.maskdit import maskdit_from_config
from ezaudio_tpu.training.optim import decay_mask, make_optimizer
from ezaudio_tpu.training.trainer import TrainState, make_train_step
from tests.test_dit import TINY_MODEL
from tests.tiny_config import TINY_CONFIG


def _fresh(params):
    """Deep-copy a param tree: train steps DONATE their input state (the
    production memory posture), so each test must hand the step its own copy
    instead of the module-scoped fixture's buffers."""
    return jax.tree.map(jnp.copy, params)


@pytest.fixture(scope="module")
def setup():
    model = maskdit_from_config(TINY_MODEL)
    key = jax.random.PRNGKey(0)
    B, L, C = 8, 32, 8
    x = jnp.zeros((B, L, C))
    ctx = jnp.zeros((B, 5, 24))
    variables = model.init({"params": key, "mask": key}, x, jnp.zeros((B,), jnp.int32), ctx)
    params = variables["params"]
    schedule = DDIMSchedule.from_config(TINY_CONFIG["diff"])
    return model, params, schedule


def make_batch(rng, B=8, L=32, C=8, Lc=5, D=24):
    return {
        "latents": jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32)),
        "text": jnp.asarray(rng.standard_normal((B, Lc, D)).astype(np.float32)),
        "text_mask": jnp.ones((B, Lc), bool),
        "uncond": jnp.asarray(rng.standard_normal((1, Lc, D)).astype(np.float32)),
        "uncond_mask": jnp.ones((1, Lc), bool),
    }


class TestDecayMask:
    def test_kernels_decay_everything_else_not(self, setup):
        _, params, _ = setup
        mask = decay_mask(params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, v in flat:
            name = path[-1].key
            assert v == (name == "kernel"), path
        # sanity: both classes exist
        vals = [v for _, v in flat]
        assert any(vals) and not all(vals)


class TestTrainStep:
    def test_loss_decreases_single_device(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=2e-3, warmup=0, grad_clip=1.0)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        batch = make_batch(rng)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            state, m = step(state, batch, key)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_warmup_lr_gates_first_steps(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=1.0, warmup=10_000)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        p0 = jax.device_get(state.params)  # snapshot: the step donates state
        state2, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
        # lr ~ 1/10000 of 1.0 -> param delta tiny
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, state2.params)
        assert max(jax.tree.leaves(d)) < 1e-3

    def test_accumulation_steps(self, setup, rng):
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=1e-3, warmup=0,
                            accumulation_steps=2)
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        p0 = jax.device_get(state.params)  # snapshot: the step donates state
        s1, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
        # first micro-step: no update applied yet
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, s1.params)
        assert max(jax.tree.leaves(d)) == 0.0
        s2, _ = step(s1, make_batch(rng), jax.random.PRNGKey(1))
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         p0, s2.params)
        assert max(jax.tree.leaves(d)) > 0.0

    def test_bf16_moments_opt_in(self, setup, rng):
        """mu_dtype='bfloat16' (the probe12 optimizer-bandwidth lever):
        first moment stored bf16, loss still decreases."""
        model, params, schedule = setup
        tx = make_optimizer(params, learning_rate=2e-3, warmup=0,
                            mu_dtype="bfloat16")
        step = make_train_step(model, schedule, tx)
        state = TrainState.create(_fresh(params), tx)
        mus = [l for l in jax.tree.leaves(state.opt_state)
               if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
        assert mus, "no bf16 moment buffers in the optimizer state"
        for i in range(12):
            state, m = step(state, make_batch(rng), jax.random.PRNGKey(i))
        # params must remain f32 (only the moment is low-precision)
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(state.params))
        assert np.isfinite(float(m["loss"]))

    def test_adafactor_opt_in(self, setup, rng):
        """optimizer='adafactor': factored second moment (less state than
        AdamW), loss decreases on the same tiny problem."""
        model, params, schedule = setup
        tx_a = make_optimizer(params, learning_rate=2e-3, warmup=0)
        tx_f = make_optimizer(params, learning_rate=2e-3, warmup=0,
                              optimizer="adafactor", factor_min_dim=8)
        sz = lambda tx: sum(  # noqa: E731
            l.size for l in jax.tree.leaves(tx.init(params))
            if hasattr(l, "size"))
        assert sz(tx_f) < sz(tx_a)
        step = make_train_step(model, schedule, tx_f)
        state = TrainState.create(_fresh(params), tx_f)
        losses = []
        for i in range(12):
            state, m = step(state, make_batch(rng), jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()


class TestDataParallel:
    def test_dp_step_matches_single_device(self, setup, rng):
        """The sharded step must produce the same loss/update as unsharded —
        XLA's inserted psum is the DDP all-reduce."""
        from ezaudio_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        model, params, schedule = setup
        assert len(jax.devices()) == 8
        mesh = make_mesh(dp=8)
        tx = make_optimizer(params, learning_rate=1e-3, warmup=0)
        step = make_train_step(model, schedule, tx)

        batch = make_batch(rng)
        key = jax.random.PRNGKey(0)

        state = TrainState.create(_fresh(params), tx)
        s_ref, m_ref = step(state, batch, key)

        # replicate() may ALIAS the source buffers (device_put on the same
        # device skips the copy), so the donating step would invalidate
        # the module-scoped fixture params — replicate a fresh copy
        state_sh = TrainState.create(replicate(mesh, _fresh(params)), tx)
        batch_sh = shard_batch(mesh, batch)
        s_dp, m_dp = step(state_sh, batch_sh, key)

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s_ref.params, jax.device_get(s_dp.params))
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_fsdp_sharding_specs(self, setup):
        from ezaudio_tpu.parallel.mesh import make_mesh, param_shardings

        model, params, _ = setup
        mesh = make_mesh(dp=2, fsdp=4)
        sh = param_shardings(mesh, params)
        specs = [s.spec for s in jax.tree.leaves(sh)]
        # at least the big kernels get sharded over fsdp
        assert any("fsdp" in str(s) for s in specs)

    def test_trainer_uses_dit_aware_shardings(self, setup):
        """Trainer.create must shard with the DiT-aware rules: adaln /
        time-conditioning params replicated (the generic largest-axis
        rule shards them, and the SPMD partitioner then involuntarily
        rematerializes their grads every step)."""
        from ezaudio_tpu.parallel.mesh import make_mesh
        from ezaudio_tpu.training.trainer import Trainer

        model, params, schedule = setup
        mesh = make_mesh(dp=2, fsdp=4)
        tr = Trainer.create(model, schedule, _fresh(params),
                            {"learning_rate": 1e-3, "warmup": 0}, mesh=mesh)
        flat = jax.tree_util.tree_flatten_with_path(tr.state.params)[0]
        checked = sharded = 0
        for path, leaf in flat:
            names = [getattr(p, "key", str(p)) for p in path]
            spec = leaf.sharding.spec
            if any(n in ("adaln", "time_ada", "time_ada_final",
                         "time_embed", "final_block") for n in names):
                assert all(a is None for a in spec), (names, spec)
                checked += 1
            if any(a is not None for a in spec):
                sharded += 1
        assert checked > 0     # the replication rule actually fired
        assert sharded > 0     # and the big kernels still shard


class TestFifthReviewBatch:
    def test_min_snr_epsilon_finite_at_terminal_step(self):
        """zero-terminal-SNR + epsilon prediction + min-SNR weighting used
        to divide by snr=0 at t=T-1 and NaN the batch loss."""
        from ezaudio_tpu.training.losses import masked_diffusion_loss

        cfg = dict(TINY_CONFIG["diff"], prediction_type="epsilon")
        schedule = DDIMSchedule.from_config(cfg)
        assert float(schedule.snr(jnp.array([cfg["num_train_timesteps"] - 1]))[0]) == 0.0
        B, L, C = 2, 8, 4
        pred = jnp.ones((B, L, C))
        target = jnp.zeros((B, L, C))
        mask = jnp.ones((B, L, 1))
        t = jnp.array([0, cfg["num_train_timesteps"] - 1])
        loss = masked_diffusion_loss(pred, target, mask, schedule, t,
                                     snr_gamma=5.0)
        assert np.isfinite(float(loss))

    def test_save_checkpoint_skip_existing(self, tmp_path):
        import optax

        from ezaudio_tpu.training.trainer import Trainer, TrainState

        params = {"w": jnp.ones((2,))}
        tx = optax.sgd(1e-2)
        tr = Trainer(model=None, schedule=None, tx=tx,
                     state=TrainState.create(params, tx), step_fn=None,
                     mesh=None)
        d = str(tmp_path / "ck")
        tr.save_checkpoint(d, 5)
        # duplicate step must be a clean no-op (with our manager options
        # orbax returns False rather than raising; skip_existing makes the
        # intent explicit and joins the in-flight write)
        tr.save_checkpoint(d, 5, skip_existing=True)
        tr.save_checkpoint(d, 5)
        assert tr._manager(d).all_steps() == [5]
        tr.close()

    def test_resumable_iterator_rebinds_augmenter_rng(self, tmp_path):
        import pandas as pd

        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.dataset import EACaps, ResumableIterator

        sr = 8000
        rng = np.random.default_rng(0)
        rows = []
        for i in range(2):
            save_wav(str(tmp_path / f"{i}.wav"),
                     (0.3 * rng.standard_normal(sr)).astype(np.float32), sr)
            rows.append(dict(audio_path=f"{i}.wav", caption=str(i),
                             split="train", audio_length=1.0,
                             absolute_index=i, fine_tune_data=True))
        pd.DataFrame(rows).to_csv(tmp_path / "meta.csv", index=False)
        ds = EACaps(data_dir=str(tmp_path) + "/",
                    meta_dir=str(tmp_path / "meta.csv"), subset="train",
                    seg_length=1, sr=sr,
                    aug_config={"phase180": {"p": 0.5}}, seed=0)
        it = iter(ResumableIterator(ds, batch_size=2, seed=0))
        next(it)
        assert ds.augmenter.rng is ds.rng  # epoch stream, not init stream

    def test_load_audio_resamples_foreign_rate(self, tmp_path):
        import pandas as pd

        from ezaudio_tpu.data.audio_io import save_wav
        from ezaudio_tpu.data.dataset import EACaps

        rng = np.random.default_rng(0)
        save_wav(str(tmp_path / "0.wav"),
                 (0.3 * rng.standard_normal(44100)).astype(np.float32), 44100)
        pd.DataFrame([dict(audio_path="0.wav", caption="x", split="train",
                           audio_length=1.0, absolute_index=0,
                           fine_tune_data=True)]).to_csv(
            tmp_path / "meta.csv", index=False)
        ds = EACaps(data_dir=str(tmp_path) + "/",
                    meta_dir=str(tmp_path / "meta.csv"), subset="train",
                    seg_length=1, sr=8000)
        clip, _ = ds[0]
        assert clip.shape == (8000,)  # resampled, not AssertionError

    def test_hash_tokenizer_fallback_warns(self, tmp_path):
        import warnings

        from ezaudio_tpu.text.tokenizer import HashTokenizer, get_tokenizer

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            tok = get_tokenizer(str(tmp_path / "missing"))
        assert isinstance(tok, HashTokenizer)
        assert any("hash" in str(x.message).lower() for x in w)
