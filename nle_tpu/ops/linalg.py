"""Dense symmetric eigensolver wrappers and safe elementwise inverses.

Mirrors the semantics of the reference numerics core with jit-compatible
static shapes:

- `eigh_descending` == `eigenDecomposition` (reference src/filter.cpp:204-228):
  eigenvalues sorted descending, entries below `eps` *masked to zero* instead
  of truncated. Zeroing is algebraically equivalent to the reference's
  column-dropping because every downstream use multiplies eigenvectors by
  (a function of) their eigenvalue that maps 0 -> 0; masking keeps shapes
  static for XLA.
- `safe_reciprocal` == `inplaceReciprocal` (src/filter.cpp:42-54):
  x -> 1/x where |x| >= eps else 0.
- `safe_rsqrt`: the `inplaceReciprocal` + `cwiseSqrt` composition used for
  Lambda^{-1/2} (src/filter.cpp:289-291, 319-321).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def eigh64(M: np.ndarray):
    """Host float64 symmetric eigendecomposition (ascending). scipy's evd
    driver is the same LAPACK syevd numpy uses, minus some overhead."""
    try:
        import scipy.linalg as sla
    except ImportError:
        return np.linalg.eigh(M)
    return sla.eigh(M, driver="evd", check_finite=False)


def safe_reciprocal(x: jax.Array, eps: float) -> jax.Array:
    valid = jnp.abs(x) >= eps
    return jnp.where(valid, 1.0 / jnp.where(valid, x, 1.0), 0.0)


def safe_rsqrt(x: jax.Array, eps: float) -> jax.Array:
    # x >= eps, NOT |x| >= eps: rsqrt needs a positive argument — copying
    # safe_reciprocal's magnitude guard here would let x <= -eps through
    # to a NaN instead of the masked 0 the name promises. (Call sites all
    # pre-mask with x >= eps today; this keeps the function safe anyway.)
    valid = x >= eps
    return jnp.where(valid, jax.lax.rsqrt(jnp.where(valid, x, 1.0)), 0.0)


def eigh_descending(M: jax.Array, eps: float, method: str = "xla"):
    """Full symmetric eigendecomposition, descending, eps-masked.

    Returns (U, lam) with U (n, n) eigenvectors as columns and lam (n,)
    eigenvalues, sorted descending, with lam[i] < eps replaced by 0.
    Because lam is sorted descending, elementwise masking equals the
    reference's prefix-truncation rule (src/filter.cpp:213-216).

    Inputs that are only approximately symmetric (Wa after finitely many
    Sinkhorn rounds — the reference leaves it unsymmetrized, see the
    commented-out line at src/filter.cpp:496) are resolved the way Eigen's
    SelfAdjointEigenSolver does: only the LOWER triangle is referenced.
    jnp.linalg.eigh would instead average (A + A^T)/2, which measurably
    shifts the final eigenvalues, so mirror the lower triangle explicitly.

    method:
      "xla"    — jnp.linalg.eigh on device (TPU QDWH/Jacobi or CPU LAPACK).
      "host64" — float64 LAPACK on the host via pure_callback. The matrices
        here are tiny (p x p, p ~ a few hundred) while their eigensystems
        gate the accuracy of the whole Nystrom chain; a float32 eigh's
        O(n * eps32 * ||A||) backward error is the dominant noise source of
        the f32 pipeline, so spending a microsecond-scale host roundtrip
        buys back most of the reference's fp64 fidelity.
    """
    if method not in ("xla", "host64", "host64-chain"):
        # Fail fast: a typo'd method silently falling through to the f32
        # device eigh would cost ~25 dB of golden PSNR with no error
        # (the chain gates fidelity). "host64-chain" reaches here from
        # ka_eigh_stage when the f64 work lives in the OUTER host chain —
        # the inner eigh then correctly runs the device path.
        raise ValueError(
            f"unknown eigh method {method!r} "
            "(expected 'xla', 'host64', or 'host64-chain')")
    low = jnp.tril(M)
    M = low + jnp.tril(M, -1).T
    if method == "host64":
        lam, U = _host_eigh64(M)
    else:
        lam, U = jnp.linalg.eigh(M)
    lam = lam[::-1]
    U = U[:, ::-1]
    lam = jnp.where(lam >= eps, lam, 0.0)
    return U, lam


def topk_eigendecomposition(M: np.ndarray, n_largest: int, eps: float = 1e-10,
                            *, return_converged: bool = False):
    """Iterative top-k symmetric eigensolver, host-side.

    API-parity port of the reference's optional Spectra path
    (`topkEigenDecomposition`, src/filter.cpp:169-200, USE_SPECTRA): largest-
    magnitude Lanczos with k clamped to n-1, non-convergence reported as a
    warning (not an error), and eigenvalues below eps truncated. Backed by
    scipy.sparse.linalg.eigsh (ARPACK — the same algorithm family Spectra
    implements).

    The Lanczos start vector is pinned (constant v0) so results are
    DETERMINISTIC: ARPACK's default random v0 draws from process-global
    state, so back-to-back trainings of the same image would produce
    rotated eigenbases — violating the repo's bitwise training-determinism
    invariant (tests/test_pipeline.py). n == 1 (k would clamp to 0, which
    ARPACK rejects) falls back to the dense solver.

    return_converged=True appends a bool: False when ARPACK stopped short
    (warn-and-continue). Rank-DISCOVERY callers (ka_eigh_topk_host64's
    doubling loop) need it — a non-converged short result is
    indistinguishable from genuine eps-truncation by length alone.
    """
    import scipy.sparse.linalg as spla

    from nle_tpu.utils.logging import logger

    M = np.asarray(M, np.float64)
    n = M.shape[0]
    k = min(n_largest, n - 1)
    converged = True
    if k < 1:
        lam, U = eigh64(M)
        lam, U = lam[::-1].copy(), U[:, ::-1].copy()
        keep = int(np.count_nonzero(lam >= eps))
        out = (U[:, :keep], lam[:keep])
        return (*out, True) if return_converged else out
    ncv = min(2 * k, n)
    v0 = np.full(n, 1.0 / np.sqrt(n))
    try:
        lam, U = spla.eigsh(M, k=k, which="LM", ncv=ncv, v0=v0)
    except spla.ArpackNoConvergence as e:  # mirror the reference warning
        logger.warning(
            "Eigen decomposition NOT successful. Results might be inaccurate."
        )
        lam, U = e.eigenvalues, e.eigenvectors
        converged = False
    except spla.ArpackError as e:
        # Hard ARPACK failures (e.g. "starting vector is zero" on a
        # degenerate all-zero M — a 0-iteration Sinkhorn leaves c = 0 and
        # Q = 0) fall back to the exact dense solver: the warn-and-continue
        # policy above must cover solver-refuses too, not only
        # non-convergence (a crash here takes down the whole host chain).
        logger.warning(
            "Top-k eigensolver failed (%s); falling back to dense eigh.", e)
        lam, U = eigh64(M)
        sel = np.argsort(np.abs(lam))[::-1][:k]   # LM selection, as eigsh
        lam, U = lam[sel], U[:, sel]
    order = np.argsort(lam)[::-1]
    lam = lam[order]
    U = U[:, order]
    keep = int(np.count_nonzero(lam >= eps))
    if keep < lam.size:
        U, lam = U[:, :keep], lam[:keep]
    return (U, lam, converged) if return_converged else (U, lam)


def _host_eigh64(M: jax.Array):
    n = M.shape[0]
    dtype = M.dtype

    def cb(a):
        lam64, u64 = eigh64(np.asarray(a, dtype=np.float64))
        return lam64.astype(dtype), u64.astype(dtype)

    out_shape = (
        jax.ShapeDtypeStruct((n,), dtype),
        jax.ShapeDtypeStruct((n, n), dtype),
    )
    return jax.pure_callback(cb, out_shape, M, vmap_method="sequential")
