"""One-shot Nystrom orthogonalization (Fowlkes et al. style), factored.

Reference semantics (src/filter.cpp:282-331):
    Wa^{-1/2} = U diag(lam^{-1/2}) U^T
    Q  = Wa + Wa^{-1/2} (Wab Wab^T) Wa^{-1/2}
    eig(Q) -> (Vq, Sq), top-k
    V  = [Wa; Wab^T] Wa^{-1/2} Vq diag(Sq^{-1/2})

TPU-first reformulation: with the Sinkhorn factorization
    Wab = diag(r_a) Ga (diag(c_b) phi_b)^T,   Ga = U_K * lam_K,
every Wab product collapses to small (m x m) contractions plus one streaming
pass over phi_b:
    Wab Wab^T = R Ga (phi_b^T diag(c_b)^2 phi_b) Ga^T R     (m x m inner)
    Wab^T  X  = (diag(c_b) phi_b) (Ga^T (r_a * X))          ((N-p) x k)
so the (p, N-p) Wab block of the reference never exists in HBM — the big
operands are only phi (N, m) and the output V (N, k).

Eigenvalue masking: columns of V whose Q-eigenvalue fell below eps come out
identically zero (Sq^{-1/2} is eps-masked), which reproduces the reference's
column-dropping — a zero eigenvector column contributes nothing to
V diag(f(S)) V^T regardless of f.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nle_tpu.ops.linalg import eigh_descending, safe_rsqrt


def orthogonalize(Wa: jax.Array, Wab: jax.Array, n_eig_vectors: int = 5,
                  eps: float = 1e-10, eigh_method: str = "xla"):
    """Dense variant matching the reference signature (src/filter.cpp:282-331):
    takes explicit (Wa, Wab) blocks, returns (V (N, k), Sq (k,)).

    The pipeline uses `orthogonalize_factored`; this form exists for API
    parity with the reference's free function and for the ported unit tests.
    """
    Uw, lw = eigh_descending(Wa, eps, eigh_method)
    inv_root_wa = (Uw * safe_rsqrt(lw, eps)[None, :]) @ Uw.T
    Q = Wa + inv_root_wa @ (Wab @ Wab.T) @ inv_root_wa
    Uq, lq = eigh_descending(Q, eps, eigh_method)
    k = min(n_eig_vectors, Q.shape[0])
    Vq = Uq[:, :k]
    Sq = lq[:k]
    T = inv_root_wa @ (Vq * safe_rsqrt(Sq, eps)[None, :])
    V = jnp.concatenate([Wa @ T, Wab.T @ T], axis=0)
    return V, Sq


def orthogonalize_factored(
    Wa: jax.Array,       # (m, m) balanced top block (boundary at m kept eigvals)
    RGa: jax.Array,      # (m, m) diag(r_a) @ Ga
    phi_b: jax.Array,    # (N-m, m) Nystrom factor rows below the Wa block
    c_b: jax.Array,      # (N-m,) Sinkhorn column scaling for those rows
    r_a: jax.Array,      # (m,) Sinkhorn row scaling for the Wa block
    Ga: jax.Array,       # (m, m) phi[:m] * lam
    n_eig_vectors: int,
    eps: float,
    eigh_method: str = "xla",
):
    """Returns (V, Sq): V (N, k) packed-order orthonormal eigenvectors of the
    balanced filter W, Sq (k,) its eigenvalues (descending, eps-masked)."""
    Uw, lw = eigh_descending(Wa, eps, eigh_method)
    inv_root_wa = (Uw * safe_rsqrt(lw, eps)[None, :]) @ Uw.T

    cphib = c_b[:, None] * phi_b                       # (N-p, m)
    Sb = cphib.T @ cphib                               # (m, m) psum point when sharded
    wab_wabT = RGa @ Sb @ RGa.T                        # (p, p)
    Q = Wa + inv_root_wa @ wab_wabT @ inv_root_wa

    Uq, lq = eigh_descending(Q, eps, eigh_method)
    k = min(n_eig_vectors, Q.shape[0])
    Vq = Uq[:, :k]
    Sq = lq[:k]

    T = inv_root_wa @ (Vq * safe_rsqrt(Sq, eps)[None, :])   # (p, k)
    Va = Wa @ T                                             # (p, k)
    Vb = cphib @ (Ga.T @ (r_a[:, None] * T))                # (N-p, k)
    V = jnp.concatenate([Va, Vb], axis=0)
    return V, Sq
