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
import numpy as np

from nle_tpu.ops.linalg import eigh_descending, safe_rsqrt
from nle_tpu.ops.linalg import eigh64 as _eigh64


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
    balanced filter W, Sq (k,) its eigenvalues (descending, eps-masked).

    The default f32 pipeline does NOT use this single-jit form — it splits
    around `host_chain64` (the axon TPU runtime does not support host
    callbacks inside jit): see ops/pipeline.py train_filter.
    """
    k = min(n_eig_vectors, Wa.shape[0])
    cphib = c_b[:, None] * phi_b                       # (N-m, m)
    Sb = cphib.T @ cphib                               # (m, m) psum point when sharded

    Uw, lw = eigh_descending(Wa, eps, eigh_method)
    inv_root_wa = (Uw * safe_rsqrt(lw, eps)[None, :]) @ Uw.T
    wab_wabT = RGa @ Sb @ RGa.T                    # (m, m)
    Q = Wa + inv_root_wa @ wab_wabT @ inv_root_wa
    Uq, lq = eigh_descending(Q, eps, eigh_method)
    Vq = Uq[:, :k]
    Sq = lq[:k]
    T = inv_root_wa @ (Vq * safe_rsqrt(Sq, eps)[None, :])   # (m, k)
    Va = Wa @ T                                             # (m, k)
    GrT = Ga.T @ (r_a[:, None] * T)                         # (m, k)

    Vb = cphib @ GrT                                   # (N-m, k)
    V = jnp.concatenate([Va, Vb], axis=0)
    return V, Sq


def _scaled_congruence(B: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """B @ sb @ B.T for the symmetric PSD Sb gram, exploiting symmetry:
    chol(sb) then dtrmm + dsyrk costs ~1.3 m^3 flops against the 4 m^3 of
    the two plain dgemms — on this single-core host that is ~30 ms back per
    train at m = 600. Only the LOWER triangle of the result is guaranteed
    (dsyrk fills one triangle); every consumer follows the repo-wide
    lower-triangle eigh rule, so that is the contract here too.

    Sb is PSD in exact arithmetic (a Gram matrix) but reaches the host
    through f32 accumulation; if that noise makes it numerically indefinite
    Cholesky fails and the dense-GEMM path is used instead (bitwise
    deterministic either way for a given input).
    """
    try:
        import scipy.linalg as sla
        from scipy.linalg import blas as slb
    except ImportError:
        return (B @ sb) @ B.T
    try:
        # Reads the lower triangle only — same side the device Sb kernels
        # and the eigh convention use.
        L = sla.cholesky(sb, lower=True, check_finite=False)
    except np.linalg.LinAlgError:
        return (B @ sb) @ B.T
    C = slb.dtrmm(1.0, L, B, side=1, lower=1)       # C = B @ L
    out = slb.dsyrk(1.0, C, lower=1)                # lower(C @ C.T)
    return np.asarray(out)


def host_chain64(wa, rga, sb, k: int, eps: float,
                 q_solver: str = "auto"):
    """Float64 host (NumPy) evaluation of the orthogonalization small-matrix
    chain (reference src/filter.cpp:282-331 semantics: lower-triangle eigh,
    eps truncation via masking). The chain is chaos-sensitive — eig(Wa) has
    near-degenerate small eigenvalues amplified by Wa^{-1/2} — and float32
    arithmetic there costs ~25 dB of golden-image fidelity
    (tests/test_golden.py), so it runs at f64 on the host between the two
    jitted device stages (the matrices are m x m, m ~ hundreds).

    The chain is evaluated in eig(Wa)'s basis: with Wa = Uw L Uw^T and
    E = Uw^T diag(r) Ga,

        Q~ = Uw^T Q Uw = L + D (E Sb E^T) D,   D = diag(rsqrt-safe(L))

    is SIMILAR to the reference's Q (same eigenvalues; eigenvectors rotate
    by Uw, which the final T = Uw X undoes) but costs 3 m^3 GEMMs instead
    of 5 — Wa^{-1/2} is never formed and E is reused for GrT = E^T X.
    Because Q's symmetrization reads the lower triangle (== the mirrored
    Wa used for eig(Wa)), the similarity is exact, not approximate.

    eig(Q~) only needs the top n_eig_vectors pairs — the reference's
    optional Spectra build swaps a Lanczos top-k solver in exactly here
    (src/filter.cpp:308-316, USE_SPECTRA). q_solver:
      "auto"  — ARPACK top-k when it measures faster (m >= 128 and
                4k <= m: 92 -> 31 ms at m = 600, k = 5; 515 -> 91 ms at
                m = 1446), full LAPACK otherwise.
      "evd"   — always the full solver.
      "topk"  — always ARPACK (reference USE_SPECTRA behavior, incl. the
                warn-and-continue non-convergence semantics).

    Returns float64 (Va (m, k), GrT (m, k), Sq (k,)).
    """
    wa = np.asarray(wa, np.float64)
    rga = np.asarray(rga, np.float64)
    m = wa.shape[0]
    if q_solver not in ("auto", "evd", "topk"):
        # Validate BEFORE the eig(Wa) + E + Qt work (and before blocking on
        # the Sb fetch): a typo'd NLE_Q_SOLVER must fail fast, not after
        # ~100 ms of f64 chain per image.
        raise ValueError(
            f"q_solver={q_solver!r}: expected auto|evd|topk "
            "(NLE_Q_SOLVER?)")

    def eigh_desc_raw(M):
        # Lower-triangle semantics (the repo-wide eigh rule) come for free:
        # scipy.linalg.eigh (lower=True) and np.linalg.eigh (UPLO='L')
        # read ONLY the lower triangle, so passing M directly is
        # bit-identical to mirroring it first — and skips two m x m f64
        # temporaries on the latency-critical single-core host chain.
        # (The topk branch below MUST still mirror: ARPACK matvecs use the
        # full matrix.)
        lam, U = _eigh64(M)
        return U[:, ::-1].copy(), lam[::-1].copy()

    def rsqrt_safe(x):
        valid = np.abs(x) >= eps
        return np.where(valid, 1.0 / np.sqrt(np.where(valid, x, 1.0)), 0.0)

    Uw, lw_raw = eigh_desc_raw(wa)
    d = rsqrt_safe(np.where(lw_raw >= eps, lw_raw, 0.0))
    E = Uw.T @ rga                                     # (m, m)
    # sb may be a zero-arg callable (an in-flight device fetch): it is
    # resolved only HERE, after eig(Wa) + E — callers overlap the transfer
    # with that work (see ops/pipeline.py host_orthogonalize).
    sb = np.asarray(sb() if callable(sb) else sb, np.float64)
    Qt = _scaled_congruence(d[:, None] * E, sb)
    # Uw^T (mirrored wa) Uw = diag(lw_raw) exactly up to f64 roundoff; the
    # reference adds the *unmasked* Wa here, so the raw spectrum goes on
    # the diagonal.
    Qt[np.arange(m), np.arange(m)] += lw_raw

    if q_solver == "auto":
        q_solver = "topk" if (m >= 128 and 4 * k <= m) else "evd"
    if q_solver == "topk" and k >= m:
        # ARPACK/Lanczos can return at most m-1 pairs (the reference's
        # Spectra path has the same nev < n constraint): an explicit
        # NLE_Q_SOLVER=topk with k >= m would crash at m == 1 and silently
        # zero the m-th eigenpair otherwise. The dense solver produces all
        # m pairs — use it; the auto rule (4k <= m) never lands here.
        q_solver = "evd"
    Vq = np.zeros((m, k))
    Sq = np.zeros(k)
    if q_solver == "topk":
        from nle_tpu.ops.linalg import topk_eigendecomposition

        # Same lower-triangle-mirror convention as eigh_desc_raw (the
        # repo-wide eigh rule): Qt is symmetric only to f64 roundoff, and
        # averaging would make the two solver modes disagree at the
        # chaos-amplifiable 1e-16 level for no reason.
        qt_low = np.tril(Qt)
        Uq, lq = topk_eigendecomposition(
            qt_low + np.tril(Qt, -1).T, min(k, m - 1), eps)
        r = min(k, Uq.shape[1])
        Vq[:, :r] = Uq[:, :r]
        Sq[:r] = lq[:r]
    else:
        Uq, lq = eigh_desc_raw(Qt)
        lq = np.where(lq >= eps, lq, 0.0)
        Vq[:, : min(k, m)] = Uq[:, :k]
        Sq[: min(k, m)] = lq[:k]
    # X = D Vq Sq^{-1/2}; back in pixel basis T = Uw X. Va keeps the
    # reference's use of the RAW (possibly slightly asymmetric) Wa in the
    # final product (src/filter.cpp:323-327: tmp << Wa, Wab^T).
    X = d[:, None] * (Vq * rsqrt_safe(Sq)[None, :])
    T = Uw @ X
    va = wa @ T
    grt = E.T @ X
    return va, grt, Sq
