"""utils/timing.py — data-driven device sync (relay-proof benchmarking)."""
import numpy as np

import jax
import jax.numpy as jnp

from misinfo_tpu.utils.timing import sync_fetch, time_program


def test_sync_fetch_returns_first_element():
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) + 5.0,
            "b": jnp.zeros((4,), jnp.int32)}
    # dict order: first leaf is 'a' → first element 5.0
    assert sync_fetch(tree) == 5.0


def test_sync_fetch_handles_scalar_bool_int_leaves():
    assert sync_fetch(jnp.asarray(True)) == 1.0
    assert sync_fetch(jnp.asarray(7, jnp.int32)) == 7.0
    assert sync_fetch({"x": jnp.asarray([3], jnp.bfloat16)}) == 3.0


def test_sync_fetch_empty_tree_is_noop():
    assert sync_fetch({}) == 0.0
    assert sync_fetch({"empty": jnp.zeros((0,), jnp.float32)}) == 0.0


def test_time_program_runs_iters_and_returns_output():
    calls = []

    @jax.jit
    def f(x):
        return x * 2.0

    x = jnp.ones((8,), jnp.float32)
    dt, out = time_program(lambda: (calls.append(1), f(x))[1], iters=3)
    assert dt >= 0.0
    assert len(calls) == 4  # 1 warmup + 3 timed
    np.testing.assert_allclose(np.asarray(out), 2.0)
