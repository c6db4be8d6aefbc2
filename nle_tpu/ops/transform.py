"""Eigenvalue transforms that define the image edit.

`transform_eigenvalues` maps each filter eigenvalue lam to
  f(lam) = w0 + sum_{k>=1} (w_k - w_{k-1}) * lam^k
— the polynomial that re-weights the k detail layers (layer i is the
difference of successive filter powers). Semantics of the reference
`transformEigenValues` (src/filter.cpp:334-347).

`shrink_eigenvalues` is the denoise-path transform lam -> min(lam, 1)^k
(src/filter.cpp:378-385).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _transform(eigvals: jax.Array, weights: jax.Array) -> jax.Array:
    fS = jnp.full_like(eigvals, weights[0])
    for k in range(1, weights.shape[0]):
        fS = fS + (weights[k] - weights[k - 1]) * eigvals**k
    return fS


def transform_eigenvalues(eigvals: jax.Array, weights) -> jax.Array:
    # Jitted: the eager op-by-op version costs ~10 device dispatches per
    # edit, which dominates on a tunnel-attached chip.
    return _transform(eigvals, jnp.asarray(weights, dtype=eigvals.dtype))


@jax.jit
def _shrink(eigvals: jax.Array, k: jax.Array) -> jax.Array:
    return jnp.minimum(eigvals, 1.0) ** k


def shrink_eigenvalues(eigvals: jax.Array, k) -> jax.Array:
    return _shrink(eigvals, jnp.asarray(k, dtype=eigvals.dtype))
