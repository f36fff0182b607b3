"""Device mesh + sharding rules.

The reference's only distribution strategy is NCCL data-parallel DDP via HF
accelerate (SURVEY.md §2.8; audiotools/ml/accelerator.py:41-48).  The
TPU-native equivalent is declarative: build a ``jax.sharding.Mesh`` over the
slice, annotate the batch axis with ``NamedSharding(P("dp", ...))`` and let
XLA insert the gradient ``psum`` over ICI under jit.  No hand-written
communication exists anywhere in this framework.

Axes:
  * ``dp``   — batch (prompts, and the CFG pair at inference);
  * ``fsdp`` — optional parameter/optimizer sharding (ZeRO-style): each
    parameter's largest divisible axis is sharded, gathered on use by XLA;
  * ``tp``   — Megatron-style tensor parallelism of the DiT (qkv/proj and
    mlp in/out kernel splits, see ``dit_param_shardings``); the EzAudio
    geometry (<=1B params) does not need it for parity, so defaults keep
    it at 1;
  * ``sp``   — sequence parallelism: latent frames sharded across chips,
    attention runs as an exact K/V ring over ICI
    (``parallel/ring_attention.py``) — the long-audio scaling axis.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
mesh spans all global devices in ICI-friendly order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: call once per host before make_mesh.  Thin
    wrapper over jax.distributed.initialize (the reference's
    init_process_group("nccl") analog, audiotools/ml/accelerator.py:41-48 —
    except collectives ride ICI/DCN via XLA, not a hand-managed backend)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp, sp) mesh.  ``dp=None`` -> all remaining
    devices.  ``sp`` is the sequence-parallel axis consumed by
    :mod:`ezaudio_tpu.parallel.ring_attention`; it is innermost so the K/V
    ring rides neighbouring ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp * sp) == 0, (n, fsdp, tp, sp)
        dp = n // (fsdp * tp * sp)
    assert dp * fsdp * tp * sp == n, f"mesh {dp}x{fsdp}x{tp}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp, tp, sp)
    return Mesh(arr, ("dp", "fsdp", "tp", "sp"))


def shard_batch(mesh: Mesh, tree, strict: bool = True):
    """Place a pytree with the leading axis sharded over dp (+fsdp if it
    divides — batch scales with the full data-parallel world).

    Arrays whose leading axis is >= the dp world size but not divisible by
    it are a bug (silent replication would waste the whole mesh), so they
    raise unless ``strict=False``.  Small arrays (leading axis < world,
    e.g. a single shared uncond embedding) replicate intentionally.
    """
    dp = mesh.shape["dp"] * mesh.shape["fsdp"]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0:
            spec = P(("dp", "fsdp"))
        else:
            if (strict and hasattr(x, "ndim") and x.ndim >= 1
                    and x.shape[0] >= dp):
                raise ValueError(
                    f"shard_batch: leading axis {x.shape[0]} is not divisible "
                    f"by the dp world size {dp}; this would silently "
                    f"replicate the batch across the mesh. Pad the batch or "
                    f"pass strict=False to replicate intentionally.")
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


# ---------------------------------------------------------------------------
# Activation sharding constraints (trace-time context, like ring_context)
# ---------------------------------------------------------------------------

_act_state = __import__("threading").local()


class activation_sharding:
    """Trace-time context: inside it, DiT blocks pin their (B, ...)
    activations to batch sharding via ``with_sharding_constraint``.

    Without the pin, the SPMD partitioner prefers contracting-dim-sharded
    matmuls for fsdp-stored kernels and reshards the (small) shared
    context/x activations from 8-way batch to 4-way feature layouts on a
    transposed device order — a transition it can only implement by
    involuntary full rematerialization (the r3 backward warnings).  The
    pin forces the classic fsdp plan instead: weights all-gather per
    layer, activations stay batch-sharded.

    Enter around the jit *call* (tracing happens inside).  Not applicable
    to sp>1 meshes (sequence axis shards activations by design — the ring
    attention path manages its own layouts).
    """

    def __init__(self, mesh: Mesh, batch_axes: Sequence[str] = ("dp", "fsdp")):
        assert dict(mesh.shape).get("sp", 1) == 1, \
            "activation_sharding is batch-only; sp meshes use ring_context"
        self.ctx = (mesh, tuple(a for a in batch_axes if a in mesh.axis_names))

    def __enter__(self):
        self.prev = getattr(_act_state, "ctx", None)
        _act_state.ctx = self.ctx
        return self

    def __exit__(self, *exc):
        _act_state.ctx = self.prev
        return False


def constrain_batch(x):
    """Pin a (B, ...) activation to batch sharding when an
    :class:`activation_sharding` context is active; identity otherwise."""
    ctx = getattr(_act_state, "ctx", None)
    if ctx is None or x is None or getattr(x, "ndim", 0) < 1:
        return x
    mesh, axes = ctx
    spec = P(axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _fsdp_spec(shape: Tuple[int, ...], fsdp: int) -> P:
    """Shard the largest divisible axis over fsdp; replicate otherwise.

    1-D params (norm scales/biases, linear biases) stay replicated: they
    are a negligible memory fraction, but sharding them propagates their
    feature-axis sharding into every activation they broadcast over
    (e.g. the per-block ``norm_context`` scale made the batch-sharded
    context D-sharded), which the SPMD partitioner can only undo by
    involuntary full rematerialization in the backward (r3 warnings)."""
    if fsdp == 1 or len(shape) < 2:
        return P()
    order = sorted(range(len(shape)), key=lambda i: (-shape[i], -i))
    for i in order:
        if shape[i] % fsdp == 0 and shape[i] >= 2 * fsdp:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedShardings for a parameter tree: fsdp-sharded when the axis
    divides, replicated otherwise (dp never shards parameters)."""
    fsdp = mesh.shape["fsdp"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _fsdp_spec(getattr(x, "shape", ()), fsdp)),
        params,
    )


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# Tensor-parallel rules for the DiT
# ---------------------------------------------------------------------------

def _tp_spec_for_path(path, shape, tp: int, fsdp: int) -> P:
    """Megatron-style TP layout for DiT parameters:

      * attention to_q/to_k/to_v kernels (D, D)      -> shard OUT dim (heads)
      * attention proj kernel (D, D)                 -> shard IN dim
      * mlp proj_in kernel (D, I or 2I)              -> shard OUT dim
      * mlp proj_out kernel (I, D)                   -> shard IN dim

    XLA inserts the all-reduce after proj/proj_out.  Everything else
    follows the fsdp rule (largest divisible axis) or is replicated.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grandparent = names[-3] if len(names) >= 3 else ""

    # Time-conditioning heads stay REPLICATED: their outputs ((B, 6*dim)
    # AdaLN vector, (B, 2*dim) final shift/scale) are consumed by every
    # block, so the backward sums one batch-sharded cotangent per block and
    # then needs it in the kernel-grad layout — fsdp-sharding these kernels
    # puts that layout on a transposed device order the SPMD partitioner
    # can only reach by full rematerialization (an all-gather +
    # re-partition EVERY step, MULTICHIP_r02.json).  They are <1% of
    # parameters (8M of 875M at XL), so replication is free memory-wise
    # and removes the resharding entirely.
    if any(n in ("time_ada", "time_ada_final", "time_embed", "final_block")
           for n in names):
        return P()

    # Per-block AdaLN params (ada_sola lora_a/lora_b kernels + the (6, dim)
    # scale_shift_table) are replicated outright: the module's output is
    # reshaped to (B, 6, dim) and added to the batch-sharded time_ada
    # vector, so ANY sharded layout on these kernels propagates a feature
    # sharding into that activation (or its cotangent) that the SPMD
    # partitioner can only undo by involuntary full rematerialization
    # (the r3 `out_blocks_*/adaln` warnings; an input-axis P("fsdp",None)
    # layout was A/B'd and merely moved the warnings to the lora-kernel
    # grads).  Total cost: (dim*r + r*6*dim + 6*dim) floats per block —
    # a negligible memory fraction next to the attention/MLP kernels.
    if "adaln" in names:
        return P()

    if tp > 1 and leaf == "kernel" and len(shape) == 2:
        if parent in ("to_q", "to_k", "to_v") and shape[1] % tp == 0:
            return P(None, "tp")
        if parent == "proj" and grandparent in ("attn", "cross_attn") \
                and shape[0] % tp == 0:
            return P("tp", None)
        if parent == "proj_in" and grandparent == "mlp" and shape[1] % tp == 0:
            return P(None, "tp")
        if parent == "proj_out" and grandparent == "mlp" and shape[0] % tp == 0:
            return P("tp", None)
    return _fsdp_spec(shape, fsdp)


def dit_param_shardings(mesh: Mesh, params):
    """NamedShardings for a (Mask)DiT parameter tree with TP + FSDP rules."""
    tp = mesh.shape["tp"]
    fsdp = mesh.shape["fsdp"]
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _tp_spec_for_path(path, getattr(leaf, "shape", ()), tp, fsdp))
        for path, leaf in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], specs)
