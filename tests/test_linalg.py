"""Ports of the reference Catch2 numerics tests (test/test_filter.cpp:42-68)
plus masking-semantics checks, run in float64 for the reference's 1e-10
tolerance."""

import jax
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from nle_tpu.ops.linalg import eigh_descending, safe_reciprocal, safe_rsqrt

TOL = 1e-10
EPS = 1e-10


def test_eigendecomposition_pd_tridiagonal():
    # Same fixed PD matrix as test/test_filter.cpp:44-46.
    R = jnp.array([[2.0, -1.0, 0.0], [-1.0, 2.0, -1.0], [0.0, -1.0, 2.0]])
    U, D = eigh_descending(R, EPS)
    np.testing.assert_allclose(D, [3.41421356, 2.0, 0.58578644], rtol=1e-5)
    # Reconstruction
    np.testing.assert_allclose(U @ jnp.diag(D) @ U.T, R, atol=TOL)
    # Orthonormality
    np.testing.assert_allclose(U.T @ U, np.eye(3), atol=TOL)


def test_eigh_masks_small_eigenvalues():
    # Rank-1 matrix: one eigenvalue n, rest 0 (possibly tiny negative noise).
    v = jnp.ones((4, 1))
    M = v @ v.T
    U, D = eigh_descending(M, 1e-8)
    np.testing.assert_allclose(D[0], 4.0, rtol=1e-12)
    np.testing.assert_array_equal(D[1:], np.zeros(3))


def test_safe_reciprocal_matches_inplace_reciprocal():
    # Semantics of inplaceReciprocal (src/filter.cpp:42-54): |x| >= eps -> 1/x
    # else 0 — note negatives above eps ARE inverted.
    x = jnp.array([2.0, -0.5, 1e-12, 0.0, -1e-12, 4.0])
    out = safe_reciprocal(x, EPS)
    np.testing.assert_allclose(out, [0.5, -2.0, 0.0, 0.0, 0.0, 0.25], atol=TOL)
    assert not np.any(np.isnan(out)) and not np.any(np.isinf(out))


def test_safe_rsqrt():
    x = jnp.array([4.0, 1e-12, 0.25])
    np.testing.assert_allclose(safe_rsqrt(x, EPS), [0.5, 0.0, 2.0], atol=1e-12)


def test_eigh_descending_host64_matches_xla():
    """method="host64" (pure_callback into LAPACK f64) agrees with the
    device path on an exactly-representable symmetric matrix, and runs the
    callback under jit (the path the CPU fallback of ka_eigh_stage uses;
    axon cannot — CLAUDE.md — so this is CPU-only coverage)."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((12, 12))
    M = jnp.asarray((A + A.T) / 2, jnp.float64)
    Ux, Dx = eigh_descending(M, EPS, method="xla")
    Uh, Dh = eigh_descending(M, EPS, method="host64")
    np.testing.assert_allclose(np.asarray(Dh), np.asarray(Dx),
                               rtol=1e-12, atol=1e-12)
    # Eigenvectors match up to per-column sign.
    s = np.sign(np.sum(np.asarray(Ux) * np.asarray(Uh), axis=0))
    np.testing.assert_allclose(np.asarray(Uh) * s, np.asarray(Ux),
                               atol=1e-10)

    # float32 input: the callback computes in f64 and casts back to the
    # input dtype (the _host_eigh64 contract).
    M32 = M.astype(jnp.float32)
    U32, D32 = eigh_descending(M32, EPS, method="host64")
    assert U32.dtype == jnp.float32 and D32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(D32), np.asarray(Dx),
                               rtol=1e-5, atol=1e-5)
