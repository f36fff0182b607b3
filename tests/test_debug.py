"""Numerical-safety helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezaudio_tpu.debug import assert_tree_finite, finite_guard


def test_assert_tree_finite():
    assert_tree_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a/b"):
        assert_tree_finite({"a": {"b": jnp.asarray([1.0, np.nan])}})


def test_finite_guard_passthrough_and_zeroing():
    good = {"w": jnp.ones(4)}
    guarded, bad = jax.jit(finite_guard)(good)
    assert not bool(bad)
    np.testing.assert_array_equal(np.asarray(guarded["w"]), 1.0)

    poisoned = {"w": jnp.asarray([1.0, jnp.inf, 2.0, 3.0])}
    guarded, bad = jax.jit(finite_guard)(poisoned)
    assert bool(bad)
    np.testing.assert_array_equal(np.asarray(guarded["w"]), 0.0)
