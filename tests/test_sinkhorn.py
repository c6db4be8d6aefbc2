"""Ports of the reference Sinkhorn Catch2 tests (test/test_filter.cpp:70-123)
plus factored-vs-dense equivalence."""

import numpy as np
import pytest

import oracle_numpy as O

import jax.numpy as jnp

from nle_tpu.ops.linalg import eigh_descending
from nle_tpu.ops.sinkhorn import sinkhorn, sinkhorn_vectors

TOL = 1e-10
EPS = 1e-10


def _f64(x):
    return jnp.asarray(x, jnp.float64)


def test_identity_factor():
    # test/test_filter.cpp:72-94: phi = I2, eigvals = 1.
    Wa, Wab = sinkhorn(_f64(np.eye(2)), _f64(np.ones(2)), 10, EPS)
    Wa, Wab = np.asarray(Wa), np.asarray(Wab)
    assert Wab.shape == (2, 0)
    np.testing.assert_allclose(Wa, Wa.T, atol=TOL)
    np.testing.assert_allclose(np.hstack([Wa, Wab]).sum(axis=1), 1.0, atol=TOL)
    np.testing.assert_allclose(np.vstack([Wa, Wab.T]).sum(axis=0), 1.0, atol=TOL)


def test_balanced_random_matrix(rng):
    # test/test_filter.cpp:96-122: random positive 5x5, balanced 20 iters.
    R = rng.random((5, 5))
    U, D = eigh_descending(_f64(R), EPS)
    Wa, Wab = sinkhorn(U, D, 20, EPS)
    Wa, Wab = np.asarray(Wa), np.asarray(Wab)
    np.testing.assert_allclose(Wa, Wa.T, atol=1e-8)
    np.testing.assert_allclose(np.hstack([Wa, Wab]).sum(axis=1), 1.0, atol=TOL)
    np.testing.assert_allclose(np.vstack([Wa, Wab.T]).sum(axis=0), 1.0, atol=TOL)


def test_matches_oracle(rng):
    # Random low-rank factor with n > p, vs the NumPy fp64 oracle.
    n, p = 60, 8
    M = rng.random((p, p))
    M = (M + M.T) / 2 + p * np.eye(p)
    U, D = O.eigen_decomposition(M)
    phi = np.vstack([U, rng.random((n - p, p)) * 0.1])
    Wa_o, Wab_o = O.sinkhorn(phi, D, 10)
    Wa, Wab = sinkhorn(_f64(phi), _f64(D), 10, EPS)
    np.testing.assert_allclose(np.asarray(Wa), Wa_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Wab), Wab_o, atol=1e-12)


def test_block_boundary_is_m_not_p(rng):
    """The reconstructed Wa block boundary is m = phi.cols() (the kept
    eigenvalue count), NOT the sampled-pixel count — reference
    src/filter.cpp:247 reads `p = phi.cols()`."""
    n, p, m = 40, 8, 5
    phi = _f64(rng.random((n, m)))
    lam = _f64(rng.random(m) + 0.5)
    Wa, Wab = sinkhorn(phi, lam, 5, EPS)
    assert Wa.shape == (m, m)
    assert Wab.shape == (m, n - m)
    Wa_o, Wab_o = O.sinkhorn(np.asarray(phi), np.asarray(lam), 5)
    np.testing.assert_allclose(np.asarray(Wa), Wa_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Wab), Wab_o, atol=1e-12)
