"""Ports of the reference Orthogonalize Catch2 test (test/test_filter.cpp:126-153)
plus factored-vs-dense equivalence against the oracle."""

import numpy as np

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.linalg import eigh_descending
from nle_tpu.ops.orthogonalize import orthogonalize, orthogonalize_factored
from nle_tpu.ops.sinkhorn import sinkhorn_vectors

TOL = 1e-10
EPS = 1e-10


def test_random_blocks_orthonormal(rng):
    # test/test_filter.cpp:126-153: random symmetric Wa (10,10), Wab (10,90).
    p, n, k = 10, 100, 5
    Wa = rng.random((p, p))
    Wa = (Wa + Wa.T) / 2
    Wab = rng.random((p, n - p))
    V, S = orthogonalize(jnp.asarray(Wa, jnp.float64), jnp.asarray(Wab, jnp.float64), k, EPS)
    V, S = np.asarray(V), np.asarray(S)
    assert S.size == k and V.shape == (n, k)
    assert (S != 0).any()
    nz = S != 0  # eps-masked columns are exactly zero
    np.testing.assert_allclose(
        (V[:, nz].T @ V[:, nz]), np.eye(int(nz.sum())), atol=1e-8
    )
    # Matches the fp64 oracle exactly
    V_o, S_o = O.orthogonalize(Wa, Wab, k)
    np.testing.assert_allclose(S[: S_o.size], S_o, atol=1e-10)
    np.testing.assert_allclose(np.abs(V[:, : S_o.size]), np.abs(V_o), atol=1e-8)


def test_factored_equals_dense(rng):
    # Build a genuine Sinkhorn factorization (with m < p truncation, so the
    # block boundary sits at m) and check the factored path (no Wab
    # materialization) equals the dense reference formula.
    n, m, k = 80, 6, 4
    phi = jnp.asarray(rng.random((n, m)), jnp.float64)
    lam = jnp.asarray(rng.random(m) + 0.5, jnp.float64)
    r, c = sinkhorn_vectors(phi, lam, 10, EPS)
    phi_top = phi[:m]
    Ga = phi_top * lam[None, :]
    RGa = r[:m, None] * Ga
    Wa = RGa @ (c[:m, None] * phi_top).T
    Wab = RGa @ (c[m:, None] * phi[m:]).T

    V_d, S_d = orthogonalize(Wa, Wab, k, EPS)
    V_f, S_f = orthogonalize_factored(
        Wa, RGa, phi[m:], c[m:], r[:m], Ga, k, EPS
    )
    np.testing.assert_allclose(np.asarray(S_f), np.asarray(S_d), atol=1e-12)
    np.testing.assert_allclose(np.asarray(V_f), np.asarray(V_d), atol=1e-10)
