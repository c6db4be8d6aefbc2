"""Sinkhorn-Knopp doubly-stochastic balancing in the Nystrom factor space.

The filter matrix is W = phi @ diag(lam) @ phi^T (never materialized: N x N).
Balancing alternates
    c = 1 / (phi (lam * (phi^T r))),   r = 1 / (phi (lam * (phi^T c)))
for `max_iter` rounds with the eps-guarded reciprocal — semantics of the
reference `sinkhorn` (src/filter.cpp:230-254), as a `lax.fori_loop` of four
skinny (N, m) matvecs per iteration (the streaming-bandwidth hot loop).

Instead of reconstructing the dense balanced blocks Wa (p, p) and
Wab (p, N-p) like the reference (src/filter.cpp:247-250), we return the
balancing vectors (r, c); `orthogonalize` consumes them in factored form so
the (p, N-p) Wab never exists in HBM (see ops/orthogonalize.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nle_tpu.ops.linalg import safe_reciprocal


def sinkhorn_vectors(phi: jax.Array, lam: jax.Array, max_iter: int, eps: float):
    """Run balancing; returns (r, c) each (N,).

    phi: (N, m) Nystrom eigenvector factor; lam: (m,) masked eigenvalues.
    """
    n = phi.shape[0]
    r0 = jnp.ones((n,), dtype=phi.dtype)
    c0 = jnp.zeros((n,), dtype=phi.dtype)

    def w_matvec(x):
        return phi @ (lam * (phi.T @ x))

    def body(_, rc):
        r, c = rc
        c = safe_reciprocal(w_matvec(r), eps)
        r = safe_reciprocal(w_matvec(c), eps)
        return (r, c)

    return jax.lax.fori_loop(0, max_iter, body, (r0, c0))


def sinkhorn(phi: jax.Array, lam: jax.Array, max_iter: int = 10, eps: float = 1e-10):
    """Dense-output variant matching the reference signature exactly:
    returns (Wa (m, m), Wab (m, N-m)) like src/filter.cpp:230-254.

    NOTE the block boundary: the reference sets `p = phi.cols()` — the
    number of *kept eigenvalues* m, not the number of sampled pixels — so
    when the eps truncation dropped columns, Wa covers only the first m
    packed rows. This quirk is load-bearing for golden-output parity.

    The pipeline itself uses `sinkhorn_vectors` + factored consumers and
    never materializes Wab; this form exists for API parity and tests.
    """
    r, c = sinkhorn_vectors(phi, lam, max_iter, eps)
    m = phi.shape[1]
    Ga = phi[:m] * lam[None, :]
    RGa = r[:m, None] * Ga
    Wa = RGa @ (c[:m, None] * phi[:m]).T
    Wab = RGa @ (c[m:, None] * phi[m:]).T
    return Wa, Wab
