"""Fixed-shape span masking in pure JAX.

The reference computes fairseq-style span masks on the host in NumPy every
training step (``src/models/utils/span_mask.py:6-130`` called from
``src/models/conditioners.py:135-148`` via a ``.cpu().numpy()`` round-trip).
On TPU that host ping-pong would stall the step, so we re-derive the same
distribution with static shapes inside the jitted step:

  * number of spans:  ``num = max(min_masks, floor(p * L / span + U[0,1)))``
    — identical probabilistic rounding to the reference ("static" mask type);
  * span starts: ``num`` distinct uniform draws from ``[0, L - span]`` —
    implemented as top-k over i.i.d. uniform scores, which yields a uniformly
    distributed subset without replacement (the reference's
    ``np.random.choice(sz - min_len, num, replace=False)``);
  * the final mask is the union of ``[start, start + span)`` intervals, so
    overlap statistics match (overlaps only occur between different spans,
    as in the reference).

Shapes are static: we always draw ``max_spans`` candidates and invalidate
the tail, so one compiled program serves every mask ratio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_span_mask(
    key: jax.Array,
    batch: int,
    length: int,
    mask_prob: jnp.ndarray,
    mask_length: int,
    min_masks: int = 1,
) -> jnp.ndarray:
    """Return a boolean mask (batch, length); True = masked.

    ``mask_prob``: per-element probabilities, shape (batch,).
    """
    k_round, k_starts = jax.random.split(key)
    # Candidate start positions in [0, length - mask_length]; for sequences
    # no longer than the span there is exactly one start.  max_spans is
    # clamped to n_pos so top_k's k never exceeds the score axis (a
    # length within ~max_spans of mask_length used to crash at trace time).
    n_pos = max(1, length - mask_length)
    max_spans = min(length // mask_length + 1, n_pos)

    num = jnp.floor(
        mask_prob * length / float(mask_length)
        + jax.random.uniform(k_round, (batch,))
    ).astype(jnp.int32)
    num = jnp.clip(num, min(min_masks, max_spans), max_spans)

    # Distinct starts via top-k of iid uniforms.
    scores = jax.random.uniform(k_starts, (batch, n_pos))
    _, starts = jax.lax.top_k(scores, max_spans)  # (batch, max_spans), distinct
    valid = jnp.arange(max_spans)[None, :] < num[:, None]
    starts = jnp.where(valid, starts, -(length + mask_length))  # inert sentinel

    pos = jnp.arange(length)[None, None, :]
    s = starts[:, :, None]
    hit = (pos >= s) & (pos < s + mask_length)
    return jnp.any(hit, axis=1)
