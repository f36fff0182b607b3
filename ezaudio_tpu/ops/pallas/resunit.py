"""Fused Oobleck ResidualUnit kernel (Pallas, TPU).

The VAE decoder's tail blocks (C=128, L up to 240k samples at 10 s) are
the decode's cost center (probe13: block3 57 ms of the 76 ms decode at
batch 4).  The XLA path runs each ResidualUnit
``x + conv1(snake2(conv7_dilated(snake1(x))))`` as 4+ HBM round trips —
and the snake activations alone cost ~6.8 ms each at the tail geometry
(measured floor for one elementwise pass: 3.9 ms), with XLA fusing them
only partially into the convs (snake->conv7 measured 10.2 ms vs 7.2 ms
conv alone).

This kernel computes the whole unit in ONE pass: each grid program
loads a (TL + 6*dilation, C) input window into VMEM (tile + halo from
the next tile), applies snake1 on the VPU, computes the dilated k=7
conv as 7 shifted (TL, C) @ (C, C) MXU matmuls with f32 accumulation
(C=128 rides the lane width exactly — no padding tax, unlike the
attention kernel's head_dim 72), applies snake2, the 1x1 conv, and the
residual add, writing the output tile once.  HBM traffic drops from
~8 tensor passes to 2.

Reference behavior: ``src/modules/stable_vae/models/autoencoders.py``
ResidualUnit (snake-conv-snake-conv residual, dilations 1/3/9) with
SnakeBeta (``blocks.py:328+``).

Differentiable via custom_vjp: Pallas forward, XLA-composition
recompute backward (same economics as ``ops/pallas/attention.py``).
Falls back to the identical-math XLA composition on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ezaudio_tpu.ops.activations import snake_beta_vae


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def residual_unit_reference(x, w7, b7, w1, b1, a1, be1, a2, be2, dilation):
    """The identical-math XLA composition (CPU fallback + vjp backward).

    x: (B, L, C); w7: (7, C, C) HIO correlation orientation (matches
    ``ops/convs.py::Conv1d`` storage); w1: (C, C); a*/be* are the
    EXP'D per-channel snake alpha/beta (not the log-scale params).
    """
    a1, be1, a2, be2 = (t.astype(x.dtype) for t in (a1, be1, a2, be2))
    h = snake_beta_vae(x, a1, be1)
    pad = dilation * 3
    h = jax.lax.conv_general_dilated(
        h, w7, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC")) + b7
    h = snake_beta_vae(h, a2, be2)
    h = jnp.dot(h, w1, preferred_element_type=h.dtype) + b1
    return x + h


def _snake_f32(x, a, b):
    xf = x.astype(jnp.float32)
    return xf + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * xf))


def _resunit_kernel(x_ref, xh_ref, w7_ref, b7_ref, w1_ref, b1_ref,
                    ab_ref, o_ref, *, d: int, tl: int):
    """One output tile: window = tile + 6d halo rows from the next tile.

    The halo input is blocked at fine (_HALO_ROWS-row) granularity so it
    reads only ~_HALO_ROWS extra rows per tile instead of re-reading the
    whole next tile (probe14: the full-tile halo doubled input traffic).
    """
    x = x_ref[0, 0]                      # (TL, C)
    halo = xh_ref[0, 0][: 6 * d]         # (6d, C) head of the next tile
    win = jnp.concatenate([x, halo], axis=0)  # (TL + 6d, C)

    a1 = ab_ref[0].astype(jnp.float32)   # (C,) exp'd snake params
    be1 = ab_ref[1].astype(jnp.float32)
    a2 = ab_ref[2].astype(jnp.float32)
    be2 = ab_ref[3].astype(jnp.float32)

    h = _snake_f32(win, a1, be1).astype(x.dtype)   # (TL+6d, C)

    acc = jnp.zeros((tl, x.shape[-1]), jnp.float32)
    for j in range(7):                   # static unroll: 7 MXU matmuls
        acc = acc + jax.lax.dot_general(
            h[j * d: j * d + tl], w7_ref[j],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = acc + b7_ref[0].astype(jnp.float32)

    g = _snake_f32(acc, a2, be2).astype(x.dtype)
    z = jax.lax.dot_general(
        g, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    z = z + b1_ref[0].astype(jnp.float32)

    # residual add on the ORIGINAL (un-snaked) input: the window starts
    # 3d rows (the conv zero-pad) before output row 0, so sample t' of
    # the output tile aligns with window row t' + 3d
    o_ref[0, 0] = (win[3 * d: 3 * d + tl].astype(jnp.float32) + z).astype(
        o_ref.dtype)


_HALO_ROWS = 64  # multiple of 8, >= 6*d for d in (1,3,9); divides every TL


def _pick_tile(c: int) -> int:
    # VMEM budget ~262k elements per tile row-block (in-tile, f32 window
    # + accumulator, weights) — scale the tile length down as the channel
    # count grows.
    return max(_HALO_ROWS, (256 * 1024) // c // _HALO_ROWS * _HALO_ROWS)


def _resunit_pallas(x, w7, b7, w1, b1, a1, be1, a2, be2, dilation,
                    interpret=False):
    B, L, C = x.shape
    d = int(dilation)
    tl = _pick_tile(C)
    n_t = -(-L // tl)  # ceil
    # left pad = conv zero-padding (3d); right: conv pad + round-up to a
    # whole number of tiles + one extra tile for the last halo read.
    # snake(0) = 0, so zero rows stay zero through the window math.
    lpad = 3 * d
    total = (n_t + 1) * tl
    xp = jnp.pad(x, ((0, 0), (lpad, total - lpad - L), (0, 0)))
    xb = xp.reshape(B, n_t + 1, tl, C)
    # fine-grained view for the halo reads: _HALO_ROWS-row blocks
    hr = _HALO_ROWS
    xh = xp.reshape(B, total // hr, hr, C)
    hpt = tl // hr  # halo blocks per tile

    ab = jnp.stack([a1, be1, a2, be2]).astype(jnp.float32)  # (4, C)

    out = pl.pallas_call(
        functools.partial(_resunit_kernel, d=d, tl=tl),
        out_shape=jax.ShapeDtypeStruct((B, n_t, tl, C), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_t),
            in_specs=[
                pl.BlockSpec((1, 1, tl, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hr, C),
                             lambda b, i: (b, (i + 1) * hpt, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, C, C), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, C), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, tl, C), lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_t * tl * C * C * 8,
            bytes_accessed=2 * B * n_t * tl * C * 2,
            transcendentals=2 * B * n_t * tl * C,
        ),
        interpret=interpret,
    )(xb, xh, w7, b7.reshape(1, C), w1, b1.reshape(1, C), ab)

    # the window ran on x shifted by lpad, so output row 0 of tile 0 is
    # y[-3d + 3d] = y[0]: tiles map 1:1 onto output samples
    return out.reshape(B, n_t * tl, C)[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_residual_unit(x, w7, b7, w1, b1, a1, be1, a2, be2, dilation,
                        interpret=False):
    """Fused snake->conv7(dilated)->snake->conv1x1->residual.

    Pallas kernel on TPU (or ``interpret=True``); identical-math XLA
    composition elsewhere.  All args as in ``residual_unit_reference``.
    """
    if jax.default_backend() == "cpu" and not interpret:
        return residual_unit_reference(x, w7, b7, w1, b1, a1, be1, a2, be2,
                                       dilation)
    return _resunit_pallas(x, w7, b7, w1, b1, a1, be1, a2, be2, dilation,
                           interpret=interpret)


def _fru_fwd(x, w7, b7, w1, b1, a1, be1, a2, be2, dilation, interpret):
    return (fused_residual_unit(x, w7, b7, w1, b1, a1, be1, a2, be2,
                                dilation, interpret),
            (x, w7, b7, w1, b1, a1, be1, a2, be2))


def _fru_bwd(dilation, interpret, res, g):
    x, w7, b7, w1, b1, a1, be1, a2, be2 = res
    _, vjp = jax.vjp(
        lambda *args: residual_unit_reference(*args, dilation), x, w7, b7,
        w1, b1, a1, be1, a2, be2)
    return vjp(g)


fused_residual_unit.defvjp(_fru_fwd, _fru_bwd)
