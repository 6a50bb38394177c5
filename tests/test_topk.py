"""top_k_exact must be indistinguishable from lax.top_k — values,
indices, and tie resolution (smaller index wins) included, since the
detect contract (reference lib/layers/box_utils.py:294-296 sort order)
is bit-parity-tested downstream of it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odtpu.ops.topk import top_k_exact


def _check(x, k):
    vf, idf = jax.lax.top_k(x, k)
    ve, ide = top_k_exact(x, k)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(idf), np.asarray(ide))


@pytest.mark.parametrize("n", [100, 512, 8732, 24564])
def test_random_parity(n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(7, n).astype(np.float32))
    _check(x, min(200, n))


def test_tie_heavy_parity():
    # few distinct values → massive ties, including across group
    # boundaries; tie resolution must match lax.top_k exactly
    rng = np.random.RandomState(1)
    x = jnp.asarray(
        rng.choice([0.0, 0.25, 0.5, 1.0], size=(5, 8732)).astype(np.float32))
    _check(x, 200)


def test_all_equal_and_padded_tail():
    # constant input: winners are exactly indices 0..k-1
    x = jnp.full((3, 8732), 0.5, jnp.float32)
    v, idx = top_k_exact(x, 200)
    np.testing.assert_array_equal(
        np.asarray(idx), np.tile(np.arange(200), (3, 1)))
    # n not divisible by the group count exercises the -inf padding
    _check(jnp.asarray(np.random.RandomState(2)
                       .rand(4, 8731).astype(np.float32)), 200)


def test_small_n_fallback():
    # below the split threshold it must route to flat lax.top_k
    x = jnp.asarray(np.random.RandomState(3).rand(2, 300).astype(np.float32))
    _check(x, 200)


def test_vmap_and_3d():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 3, 8732).astype(np.float32))
    _check(x, 200)
    v, i = jax.vmap(lambda t: top_k_exact(t, 50))(
        jnp.asarray(rng.rand(6, 4000).astype(np.float32)))
    assert v.shape == (6, 50) and i.shape == (6, 50)
