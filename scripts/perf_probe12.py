"""Train-step MFU attack, one session (VERDICT r2 item 4).

probe9 measured the s3_xl train step at 29-33% MFU (3x-forward FLOP
convention) with full per-block remat.  This probe (a) profiles the train
step per-op the way probe6 profiled the sampler, and (b) A/Bs the levers:

  * remat policy: full (recompute whole block backward) vs dots
    (jax.checkpoint_policies.dots_with_no_batch_dims_saveable — save
    matmul outputs, recompute elementwise only) vs off (no remat);
  * per-chip batch: 4 / 8 / 12 / 16 (OOM-guarded — state donation keeps
    params+Adam ~12 GB of the 16 GB HBM).

Accounting note: with FULL remat the hardware executes ~4 forwards of
matmul work per step but only 3 count as useful (fwd + 2x bwd), so the
"useful MFU" ceiling under full remat is 75% of the machine's dense peak
utilization; 'dots' removes most of that recompute.

Run:  python -u scripts/perf_probe12.py [ab|profile] ...
Env:  PROBE12_BATCHES=4,8   PROBE12_REMAT=full,dots   (ab section)
      PROBE12_PROFILE_BATCH=8  PROBE12_PROFILE_REMAT=dots
One (remat, batch) grid per process is safest after an OOM (allocator
fragmentation) — the script catches OOM and continues, but rerun solo to
confirm a FAILED cell.
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK_TFLOPS = 197.0


def build(remat: str, tx_fn=None):
    """Fresh model + train step for a remat policy ('off' disables
    use_checkpoint; otherwise EZAUDIO_REMAT picks the jax.checkpoint
    policy at trace time).  tx_fn(params) overrides the optimizer."""
    import optax

    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.diffusion.ddim import DDIMSchedule
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    from ezaudio_tpu.training.trainer import TrainState, make_train_step

    cfg = get_model_config("s3_xl")
    mcfg = cfg.model.to_dict()
    if remat == "off":
        mcfg["use_checkpoint"] = False
    else:
        os.environ["EZAUDIO_REMAT"] = remat
    L, C, D = mcfg["img_size"], mcfg["out_chans"], mcfg["context_dim"]
    dit = maskdit_from_config(mcfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, 8, D), jnp.bfloat16))["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    schedule = DDIMSchedule.from_config(cfg.diff.to_dict())
    if tx_fn is not None:
        tx = tx_fn(params)
    else:
        tx = optax.adamw(5e-5, b1=0.9, b2=0.95, weight_decay=0.01)
    step = make_train_step(dit, schedule, tx, snr_gamma=5.0)
    state = TrainState.create(params, tx)
    return step, state, n_params, (L, C, D)


def make_batch(key, B, L, C, D):
    return {
        "latents": jax.random.normal(key, (B, L, C), jnp.float32),
        "text": jax.random.normal(key, (B, 50, D), jnp.bfloat16),
        "text_mask": jnp.ones((B, 50), bool),
        "uncond": jax.random.normal(key, (1, 50, D), jnp.bfloat16),
        "uncond_mask": jnp.ones((1, 50), bool),
    }


def section_ab():
    remats = os.environ.get("PROBE12_REMAT", "full,dots").split(",")
    batches = [int(b) for b in
               os.environ.get("PROBE12_BATCHES", "4,8").split(",")]
    key = jax.random.PRNGKey(1)
    for remat in remats:
        step, state, n_params, (L, C, D) = build(remat)
        for B in batches:
            batch = make_batch(key, B, L, C, D)
            try:
                def run():
                    nonlocal state
                    state, m = step(state, batch, key)
                    np.asarray(m["loss"])
                run()  # compile + warm
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run()
                    ts.append(time.perf_counter() - t0)
                t = float(np.median(ts))
            except Exception as e:  # noqa: BLE001 — OOM is a result here
                print(f"[remat={remat}] B={B}: FAILED ({type(e).__name__})",
                      flush=True)
                continue
            tok = B * L
            useful_tflops = 3 * 2 * n_params * tok / 1e12
            mfu = useful_tflops / t / V5E_BF16_PEAK_TFLOPS * 100
            print(f"[remat={remat}] B={B}: {t*1e3:.0f} ms/step "
                  f"({B*10.0/t:.0f} audio-s trained/s, "
                  f"{useful_tflops/t:.1f} useful TFLOP/s = {mfu:.0f}% MFU)",
                  flush=True)
        del step, state
        import gc

        gc.collect()


def section_optim():
    """A/B the optimizer-bandwidth levers at XL, same session: AdamW-f32
    (baseline) vs mu_dtype=bf16 vs Adafactor — all through
    make_optimizer so only the lever differs (incl. global-norm clip)."""
    from ezaudio_tpu.training.optim import make_optimizer

    B = int(os.environ.get("PROBE12_OPTIM_BATCH", "8"))
    variants = [
        ("adamw-f32", dict()),
        ("adamw-mu_bf16", dict(mu_dtype="bfloat16")),
        ("adafactor", dict(optimizer="adafactor")),
    ]
    key = jax.random.PRNGKey(1)
    for name, kw in variants:
        def tx_fn(params, kw=kw):
            return make_optimizer(params, learning_rate=5e-5, beta1=0.9,
                                  beta2=0.95, weight_decay=0.01,
                                  warmup=0, **kw)
        step, state, n_params, (L, C, D) = build("off", tx_fn)
        opt_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(state.opt_state)
            if hasattr(x, "dtype"))
        batch = make_batch(key, B, L, C, D)
        try:
            def run():
                nonlocal state
                state, m = step(state, batch, key)
                np.asarray(m["loss"])
            run()  # compile + warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
        except Exception as e:  # noqa: BLE001 — OOM is a result here
            print(f"[optim={name}] B={B}: FAILED ({type(e).__name__})",
                  flush=True)
            continue
        tok = B * L
        useful_tflops = 3 * 2 * n_params * tok / 1e12
        mfu = useful_tflops / t / V5E_BF16_PEAK_TFLOPS * 100
        print(f"[optim={name}] B={B}: {t*1e3:.0f} ms/step "
              f"({useful_tflops/t:.1f} useful TFLOP/s = {mfu:.0f}% MFU), "
              f"opt state {opt_bytes/1e9:.2f} GB", flush=True)
        del step, state
        import gc

        gc.collect()


def categorize(name: str) -> str:
    # ProfileData event names are full HLO instruction texts; operand
    # names on the RHS ("fusion(%slice.3, ...)") poison substring
    # classification (AdamW multiply_add fusions read as data-movement)
    # — classify on the LHS result name only.
    n = name.lower().split(" = ", 1)[0].lstrip("%").strip()
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(mixed)"
    for k in ("dot", "conv", "einsum"):
        if k in n:
            return "matmul/conv"
    for k in ("copy", "transpose", "reshape", "bitcast", "concatenate",
              "slice", "pad", "gather", "scatter", "dynamic-update"):
        if k in n:
            return "data-movement"
    for k in ("reduce", "softmax", "exp", "add", "mult", "subtract",
              "divide", "rsqrt", "tanh", "select", "compare", "convert",
              "maximum", "minimum"):
        if k in n:
            return "elementwise/reduce"
    if "rng" in n or "random" in n:
        return "rng"
    return "other"


def section_profile():
    B = int(os.environ.get("PROBE12_PROFILE_BATCH", "8"))
    remat = os.environ.get("PROBE12_PROFILE_REMAT", "full")
    step, state, n_params, (L, C, D) = build(remat)
    key = jax.random.PRNGKey(1)
    batch = make_batch(key, B, L, C, D)

    def run():
        nonlocal state
        state, m = step(state, batch, key)
        np.asarray(m["loss"])

    run()  # compile + warm
    trace_dir = "/tmp/ezaudio_trace12"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        run()

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert files, "no trace captured"
    pd = jax.profiler.ProfileData.from_file(files[-1])
    cat_ns, op_ns, total = defaultdict(int), defaultdict(int), 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            # EXACTLY the synchronous leaf-op line.  'Async XLA Ops'
            # (copy-start/copy-done DMA) overlaps the compute stream and
            # its durations span wait time — counting it made
            # "data-movement" read 81% on a compute-bound step.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                cat_ns[categorize(ev.name)] += ev.duration_ns
                op_ns[ev.name] += ev.duration_ns
                total += ev.duration_ns
    if total == 0:
        for plane in pd.planes:
            print("plane:", plane.name)
        return
    print(f"\n[train remat={remat}] B={B}: device op time {total/1e6:.1f} ms "
          f"for one step")
    print("category breakdown:")
    for cat, ns in sorted(cat_ns.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:20s} {ns/total*100:5.1f}%  ({ns/1e6:.2f} ms)")
    print("top 15 ops:")
    for nm, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ns/total*100:5.1f}%  {nm[:90]}")


SECTIONS = {"ab": section_ab, "profile": section_profile,
            "optim": section_optim}

if __name__ == "__main__":
    names = sys.argv[1:] or ["ab"]
    print("devices:", jax.devices())
    for n in names:
        SECTIONS[n]()
