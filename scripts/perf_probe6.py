"""Per-op TPU profile of the s3_xl sampler step (VERDICT r1 item 2's
"committed profile-analysis note").

Captures a jax.profiler trace of a few scan steps and aggregates device
time by op category via jax.profiler.ProfileData (no tensorboard UI
needed).  Prints the top fusions and a category summary — where the
non-MXU time goes.

Run:  python -u scripts/perf_probe6.py [batch] [impl]
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def categorize(name: str) -> str:
    n = name.lower()
    if "flash" in n or "pallas" in n:
        return "attention-kernel"
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
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host-io"
    return "other"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    impl = sys.argv[2] if len(sys.argv) > 2 else "einsum"
    STEPS = 10

    from ezaudio_tpu.config import get_model_config
    from ezaudio_tpu.models.maskdit import maskdit_from_config
    import ezaudio_tpu.models.blocks as blocks_mod

    # env var is the trace-time switch (class-attr override is a no-op:
    # dataclass defaults bake into __init__ and UDiT passes the field down)
    os.environ["EZAUDIO_ATTN_IMPL"] = impl
    cfg = get_model_config("s3_xl")
    L, C, D, Lc = (cfg.model.img_size, cfg.model.out_chans,
                   cfg.model.context_dim, 100)
    key = jax.random.PRNGKey(0)
    dit = maskdit_from_config(cfg.model.to_dict(), dtype=jnp.bfloat16)
    params = dit.init({"params": key, "mask": key},
                      jnp.zeros((1, L, C), jnp.bfloat16),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, Lc, D), jnp.bfloat16))
    x = jax.random.normal(key, (2 * B, L, C), jnp.bfloat16)
    ctx = jax.random.normal(key, (2 * B, Lc, D), jnp.bfloat16)

    def run(p, x0, c):
        def body(h, i):
            t = jnp.full((x0.shape[0],), 500 - i, jnp.int32)
            out, _ = dit.apply(p, h, t, c)
            return out.astype(h.dtype), None

        h, _ = jax.lax.scan(body, x0, jnp.arange(STEPS))
        return h

    runj = jax.jit(run)
    np.asarray(runj(params, x, ctx))  # compile + warm

    trace_dir = "/tmp/ezaudio_trace"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        np.asarray(runj(params, x, ctx))

    # find the xplane file and aggregate device-side events
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert files, "no trace captured"
    pd = jax.profiler.ProfileData.from_file(files[-1])
    cat_ns = defaultdict(int)
    op_ns = defaultdict(int)
    total = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla op" in lname or "ops" in lname:
                pass
            for ev in line.events:
                nm = ev.name
                dur = ev.duration_ns
                # only leaf op lines (XLA Ops); skip module/step lines
                if "xla" not in lname and "op" not in lname:
                    continue
                cat_ns[categorize(nm)] += dur
                op_ns[nm] += dur
                total += dur
    if total == 0:
        # fallback: dump plane/line names to understand the layout
        for plane in pd.planes:
            print("plane:", plane.name)
            for line in plane.lines:
                evs = list(line.events)
                print("  line:", line.name, "events:", len(evs))
        return

    steps_total = total / STEPS
    print(f"\n[{impl}] B={B}: device op time {total/1e6:.1f} ms over "
          f"{STEPS} steps ({steps_total/1e6:.2f} ms/step)")
    print("\ncategory breakdown:")
    for cat, ns in sorted(cat_ns.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:20s} {ns/total*100:5.1f}%  ({ns/1e6/STEPS:.2f} ms/step)")
    print("\ntop 15 ops:")
    for nm, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ns/total*100:5.1f}%  {nm[:90]}")


if __name__ == "__main__":
    main()
