"""Top-k eigensolver integration — the reference's USE_SPECTRA build path
(reference src/filter.cpp:169-200 for eig(Ka), :308-316 for eig(Q)) and
the restructured host orthogonalization chain (eigenbasis form + optional
ARPACK eig(Q))."""

import numpy as np
import pytest

from nle_tpu.ops.orthogonalize import host_chain64
from nle_tpu.ops.pipeline import (
    ka_eigh_host64,
    ka_eigh_topk_host64,
    train_filter,
)


def _chain_inputs(rng, m):
    """Plausible host-chain operands: Wa a near-symmetric balanced block,
    Sb PSD, Ga/RGa from a random orthonormal factor."""
    Uq, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.geomspace(1e-8, 1.0, m)[::-1]
    phi_top = Uq
    ga = phi_top * lam[None, :]
    ra = 1.0 + 0.1 * rng.random(m)
    ct = 1.0 + 0.1 * rng.random(m)
    rga = ra[:, None] * ga
    wa = rga @ (ct[:, None] * phi_top).T
    B = rng.standard_normal((3 * m, m)) / np.sqrt(3 * m)
    sb = B.T @ B
    return wa, rga, sb


def test_host_chain_topk_matches_evd(rng):
    """ARPACK eig(Q) and full LAPACK give the same Va/GrT/Sq (the top-k
    pairs are well-separated here, so signs aside the subspaces match)."""
    m, k = 200, 5
    wa, rga, sb = _chain_inputs(rng, m)
    va_e, grt_e, sq_e = host_chain64(wa, rga, sb, k, 1e-10,
                                     q_solver="evd")
    va_t, grt_t, sq_t = host_chain64(wa, rga, sb, k, 1e-10,
                                     q_solver="topk")
    np.testing.assert_allclose(sq_t, sq_e, rtol=1e-9, atol=1e-12)
    # Eigenvector columns are sign-ambiguous between solvers.
    np.testing.assert_allclose(np.abs(va_t), np.abs(va_e),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.abs(grt_t), np.abs(grt_e),
                               rtol=1e-6, atol=1e-9)


def test_host_chain_auto_picks_topk(rng, monkeypatch):
    """auto == topk for m >= 128 with small k, evd for small m."""
    calls = {}
    import nle_tpu.ops.linalg as L

    real = L.topk_eigendecomposition

    def spy(M, n_largest, eps=1e-10):
        calls["topk"] = True
        return real(M, n_largest, eps)

    monkeypatch.setattr(L, "topk_eigendecomposition", spy)
    m = 160
    wa, rga, sb = _chain_inputs(rng, m)
    host_chain64(wa, rga, sb, 5, 1e-10, q_solver="auto")
    assert calls.get("topk")
    calls.clear()
    wa, rga, sb = _chain_inputs(rng, 64)
    host_chain64(wa, rga, sb, 5, 1e-10, q_solver="auto")
    assert not calls.get("topk")


def _truncating_channel():
    """Four intensity classes of UNEQUAL size with hx so large the spatial
    factor rounds to exactly 1.0: the sampled Ka is exactly block-constant
    (rank 4), with eigenvalues ~ the class pixel counts (well separated)
    and a tail at machine zero — the eps truncation bites hard (m = 4 <<
    p = 100) across a clean multi-decade gap. Near-eps tails with tiny
    gaps are chaotic by design (ops/pipeline.py precision policy): there,
    two exact f64 solvers legitimately pick different bases, so
    solver-parity is only testable in this gapped regime (which is also
    the regime where a top-k solver pays off at all)."""
    r = np.arange(40)[:, None] + np.zeros((1, 50))
    digit = np.digitize(r, [16, 28, 36])       # bands of 16/12/8/4 rows
    return (80.0 * digit).astype(np.float32)


HX_HUGE = 1e12   # spatial exponent < 1e-17 -> exp rounds to exactly 1.0


def test_ka_topk_matches_host64_truncating():
    chan = _truncating_channel().astype(np.float64)
    from nle_tpu.ops.sampling import sample_grid

    grid = sample_grid(40, 50, 10, 10)
    args = (chan[grid.sel_rows, grid.sel_cols], grid.sel_rows,
            grid.sel_cols, HX_HUGE, 30.0, 1e-10)
    U_f, lam_f, Uinv_f = ka_eigh_host64(*args)
    m = lam_f.shape[0]
    p = grid.n_samples
    assert m < p and m < 64, (m, p)   # truncates AND fits the first k0
    U_t, lam_t, Uinv_t = ka_eigh_topk_host64(*args)
    assert lam_t.shape == lam_f.shape
    np.testing.assert_allclose(lam_t, lam_f, rtol=1e-9, atol=1e-13)
    # Individual eigenvector entries rotate within (near-)degenerate
    # clusters — solver-independent objects are the kept-subspace projector
    # and the weighted kernel reconstruction.
    np.testing.assert_allclose(U_t @ U_t.T, U_f @ U_f.T,
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose((U_t * lam_t) @ U_t.T,
                               (U_f * lam_f) @ U_f.T, rtol=0, atol=1e-8)


def test_ka_topk_full_spectrum_fallback(rng):
    """A rough random channel keeps (almost) its whole spectrum: doubling
    exhausts p-1 and falls back to the exact full solver."""
    chan = rng.integers(0, 256, (30, 36)).astype(np.float64)
    from nle_tpu.ops.sampling import sample_grid

    grid = sample_grid(30, 36, 6, 6)
    args = (chan[grid.sel_rows, grid.sel_cols], grid.sel_rows,
            grid.sel_cols, 50.0, 8.0, 1e-10)
    U_f, lam_f, _ = ka_eigh_host64(*args)
    assert lam_f.shape[0] > grid.n_samples - 2   # (nearly) full spectrum
    U_t, lam_t, _ = ka_eigh_topk_host64(*args, k0=8)
    np.testing.assert_array_equal(lam_t, lam_f)
    np.testing.assert_array_equal(U_t, U_f)


def test_train_filter_stage1_topk_parity():
    """End-to-end: stage1='topk' trains the same FILTER as the default on a
    truncating config (VERDICT round-1 item 2). Eigenvector columns may
    rotate within degenerate eigenvalue clusters, so parity is pinned on
    the eigenvalues and on the applied filter output (which is invariant
    to such rotations)."""
    from nle_tpu.ops.pipeline import apply_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    chan = _truncating_channel()
    V_h, S_h = train_filter(chan, 10, 10, HX_HUGE, 30.0, 8, 5, stage1="host64")
    V_t, S_t = train_filter(chan, 10, 10, HX_HUGE, 30.0, 8, 5, stage1="topk")
    np.testing.assert_allclose(np.asarray(S_t), np.asarray(S_h),
                               rtol=1e-5, atol=1e-8)
    w = [2.0, 3.0, 4.0, 1.0]
    out_h = np.asarray(apply_filter(V_h, transform_eigenvalues(S_h, w), chan))
    out_t = np.asarray(apply_filter(V_t, transform_eigenvalues(S_t, w), chan))
    np.testing.assert_allclose(out_t, out_h, rtol=1e-4, atol=1e-3)


def test_sharded_stage1_topk_parity():
    """train_filter_sharded(stage1='topk') matches the default on the
    gapped truncating config (the sharded trainer's serial stage-1 loop
    accepts the same solver knob)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from nle_tpu.parallel.sharded import make_mesh, train_filter_sharded

    batch = _truncating_channel()[None]
    mesh = make_mesh(1, 4)
    args = (10, 10, HX_HUGE, 30.0, 8, 4)
    V_h, S_h = train_filter_sharded(batch, *args, mesh)
    V_t, S_t = train_filter_sharded(batch, *args, mesh, stage1="topk")
    np.testing.assert_allclose(np.asarray(S_t), np.asarray(S_h),
                               rtol=1e-5, atol=1e-8)


def test_host_orthogonalize_callable_sb(rng, monkeypatch):
    """The Sb operand may arrive as a zero-arg callable (an in-flight
    fetch): result identical to the eager array, and the callable resolves
    AFTER eig(Wa)+E (i.e., lazily)."""
    from nle_tpu.ops.pipeline import host_orthogonalize

    m, mb, k = 24, 32, 4
    Um = np.linalg.qr(rng.standard_normal((40, m)))[0][:, :m]
    lam = np.geomspace(1e-6, 1.0, m)[::-1]
    rc = np.zeros((2, mb))
    rc[0, :m] = 1.0 + 0.1 * rng.random(m)
    rc[1, :m] = 1.0 + 0.1 * rng.random(m)
    B = rng.standard_normal((3 * mb, mb)) / np.sqrt(3 * mb)
    sb = B.T @ B
    va_e, sq_e = host_orthogonalize(rc, sb, Um, lam, m, mb, k, 1e-10)
    resolved = []
    va_l, sq_l = host_orthogonalize(
        rc, lambda: resolved.append(1) or sb, Um, lam, m, mb, k, 1e-10)
    assert resolved == [1]
    np.testing.assert_array_equal(va_l, va_e)
    np.testing.assert_array_equal(sq_l, sq_e)
    # NLE_Q_SOLVER env override reaches host_chain64.
    monkeypatch.setenv("NLE_Q_SOLVER", "bogus")
    with pytest.raises(Exception):
        host_orthogonalize(rc, sb, Um, lam, m, mb, k, 1e-10)


def test_topk_is_deterministic(rng):
    """ARPACK's default RANDOM start vector draws from process-global state,
    so back-to-back eig(Q) calls returned rotated near-degenerate eigenbases
    — violating the bitwise training-determinism invariant (the repo's
    race-detection analog). The pinned v0 makes the solver bitwise
    reproducible."""
    from nle_tpu.ops.linalg import topk_eigendecomposition

    B = rng.standard_normal((300, 300))
    M = B + B.T
    U1, l1 = topk_eigendecomposition(M, 10)
    U2, l2 = topk_eigendecomposition(M, 10)
    assert np.array_equal(U1, U2)
    assert np.array_equal(l1, l2)


def test_host_chain_topk_is_deterministic(rng):
    m, k = 200, 5
    wa, rga, sb = _chain_inputs(rng, m)
    a = host_chain64(wa, rga, sb, k, 1e-10, q_solver="topk")
    b = host_chain64(wa, rga, sb, k, 1e-10, q_solver="topk")
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_host_chain_topk_degenerate_sizes(rng):
    """Explicit q_solver='topk' must survive m == 1 and k == m: ARPACK can
    return at most m-1 pairs (the reference Spectra path's nev < n
    constraint), so those regimes fall back to the dense solver instead of
    crashing (m == 1) or silently zeroing the m-th eigenpair (k == m)."""
    wa = np.array([[2.0]])
    rga = np.array([[1.5]])
    sb = np.array([[0.5]])
    va_t, grt_t, sq_t = host_chain64(wa, rga, sb, 1, 1e-10, q_solver="topk")
    va_e, grt_e, sq_e = host_chain64(wa, rga, sb, 1, 1e-10, q_solver="evd")
    np.testing.assert_allclose(sq_t, sq_e)
    np.testing.assert_allclose(va_t, va_e)

    m = 6
    wa, rga, sb = _chain_inputs(rng, m)
    va_t, grt_t, sq_t = host_chain64(wa, rga, sb, m, 1e-10, q_solver="topk")
    va_e, grt_e, sq_e = host_chain64(wa, rga, sb, m, 1e-10, q_solver="evd")
    np.testing.assert_allclose(sq_t, sq_e, rtol=1e-9, atol=1e-12)
    # The m-th pair is produced, not silently zeroed.
    assert sq_t[m - 1] == sq_e[m - 1]


def test_topk_n1_dense_fallback():
    """n == 1 clamps k to 0, which ARPACK rejects — dense fallback."""
    from nle_tpu.ops.linalg import topk_eigendecomposition

    U, lam = topk_eigendecomposition(np.array([[3.0]]), 1)
    assert lam.shape == (1,)
    np.testing.assert_allclose(lam[0], 3.0)
    np.testing.assert_allclose(np.abs(U), [[1.0]])


def test_ka_topk_nonconvergence_falls_back_to_exact(rng, monkeypatch):
    """A NON-converged short ARPACK result must not be mistaken for
    eps-truncation ("tail captured"): the doubling loop falls back to the
    exact dense solver instead of silently training under-ranked."""
    from nle_tpu.ops import linalg as linalg_mod
    from nle_tpu.ops.pipeline import ka_eigh_host64, ka_eigh_topk_host64
    from nle_tpu.ops.sampling import sample_grid

    chan = rng.integers(0, 256, (20, 24)).astype(np.float32)
    grid = sample_grid(20, 24, 4, 5)
    args = (chan[grid.sel_rows, grid.sel_cols], grid.sel_rows,
            grid.sel_cols, 50.0, 30.0, 1e-10)
    exact = ka_eigh_host64(*args)
    real = linalg_mod.topk_eigendecomposition

    def unconverged(M, k, eps, *, return_converged=False):
        out = real(M, k, eps, return_converged=True)
        # Simulate ARPACK stopping short: fewer pairs than asked, flagged.
        U, lam, _ = out
        short = max(1, k // 2)
        res = (U[:, :short], lam[:short], False)
        return res if return_converged else res[:2]

    monkeypatch.setattr(linalg_mod, "topk_eigendecomposition", unconverged)
    got = ka_eigh_topk_host64(*args, k0=8)
    for a, b in zip(got, exact):
        np.testing.assert_array_equal(a, b)


def test_topk_hard_arpack_failure_falls_back_dense():
    """A degenerate matrix ARPACK refuses outright (all-zero M: "starting
    vector is zero", hit by 0-iteration Sinkhorn baselines) must fall
    back to the dense solver under the warn-and-continue policy — not
    crash the host chain."""
    from nle_tpu.ops.linalg import topk_eigendecomposition

    U, lam = topk_eigendecomposition(np.zeros((16, 16)), 4, eps=0.0)
    assert lam.shape[0] <= 4 and np.all(lam == 0.0)
    # And a normal matrix still takes the ARPACK path unchanged.
    rng = np.random.default_rng(0)
    A = rng.standard_normal((32, 32))
    M = A @ A.T
    U2, lam2 = topk_eigendecomposition(M, 3)
    ref = np.linalg.eigvalsh(M)[::-1][:3]
    np.testing.assert_allclose(lam2, ref, rtol=1e-10)
