"""Numerical-safety and debugging aids.

The reference's only sanitizer-adjacent machinery is
``cudnn.deterministic = True`` (src/train.py:66-67).  JAX/TPU programs are
deterministic by construction given fixed keys; what remains worth
checking is numerical health, which these helpers cover:

  * ``enable_nan_checks()`` — flip ``jax_debug_nans``/``jax_debug_infs``
    so any NaN/Inf produced under jit raises at the offending primitive;
  * ``assert_tree_finite`` — host-side check of a pytree (params, grads);
  * ``finite_guard`` — an in-graph guard that zeroes a non-finite update
    and reports it via a metric (training-loop spike protection);
  * ``interpret_pallas()`` — context manager forcing Pallas kernels into
    interpreter mode for debugging.
"""

from __future__ import annotations

import contextlib
from typing import Tuple

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def assert_tree_finite(tree, name: str = "tree"):
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not np.isfinite(np.asarray(leaf)).all():
            bad.append("/".join(str(getattr(p, "key", p)) for p in path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad[:10]}")


def finite_guard(updates, fallback=None) -> Tuple:
    """In-graph: if ANY leaf of ``updates`` is non-finite, replace the whole
    tree with ``fallback`` (zeros by default).  Returns (updates, was_bad).
    Use around optimizer updates to ride out loss spikes without a NaN'd
    model."""
    leaves = jax.tree.leaves(updates)
    ok = jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
    if fallback is None:
        fallback = jax.tree.map(jnp.zeros_like, updates)
    guarded = jax.tree.map(
        lambda u, f: jnp.where(ok, u, f), updates, fallback)
    return guarded, jnp.logical_not(ok)


@contextlib.contextmanager
def interpret_pallas():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield
