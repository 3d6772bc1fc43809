"""Pallas kernel correctness (interpret mode on CPU; the real-TPU perf
comparison lives in bench_kernels.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from cdlrm_tpu.ops.lookup import gather_rows


def test_gather_rows_matches_take(rng):
    cache = jnp.asarray(rng.normal(size=(1000, 128)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, 1000, 2048).astype(np.int32))
    out = np.asarray(gather_rows(cache, slots, True))
    np.testing.assert_allclose(out, np.asarray(cache)[np.asarray(slots)])


def test_gather_rows_vjp_scatter_add(rng):
    cache = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    slots_np = rng.integers(0, 256, 1024).astype(np.int32)
    slots = jnp.asarray(slots_np)

    def loss(c):
        return jnp.sum(gather_rows(c, slots, True) ** 2)

    g = np.asarray(jax.grad(loss)(cache))
    expected = np.zeros((256, 128), np.float32)
    np.add.at(expected, slots_np, 2 * np.asarray(cache)[slots_np])
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_gather_rows_rejects_ragged(rng):
    cache = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, 64, 1500).astype(np.int32))
    try:
        gather_rows(cache, slots, True)
        raised = False
    except ValueError:
        raised = True
    assert raised
