"""Eigenvalue transforms vs the oracle (reference src/filter.cpp:334-347,378-385)."""

import numpy as np

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.transform import shrink_eigenvalues, transform_eigenvalues


def test_transform_matches_oracle(rng):
    eig = rng.random(10)
    w = [2.0, 3.0, 4.0, 1.05]
    got = transform_eigenvalues(jnp.asarray(eig), w)
    np.testing.assert_allclose(np.asarray(got), O.transform_eigenvalues(eig, w), atol=1e-12)


def test_transform_single_weight():
    eig = jnp.asarray(np.linspace(0, 1, 5))
    got = transform_eigenvalues(eig, [3.0])
    np.testing.assert_array_equal(np.asarray(got), np.full(5, 3.0))


def test_shrink_clamps_at_one():
    eig = jnp.asarray([1.5, 1.0, 0.5, 0.0])
    got = np.asarray(shrink_eigenvalues(eig, 3.0))
    np.testing.assert_allclose(got, [1.0, 1.0, 0.125, 0.0], atol=1e-12)
