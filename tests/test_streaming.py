"""The phi-free streaming stage 2 (ops/pallas/streaming_kernel.py) must
reproduce the dense pipeline: same affinity arithmetic, different contraction
association only (~f32 rounding differences)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.ops.affinity import bandwidth_weights, features
from nle_tpu.ops.pipeline import ka_eigh_host64, train_filter
from nle_tpu.ops.sampling import sample_grid
from nle_tpu.ops.sinkhorn import sinkhorn_vectors


@pytest.fixture(scope="module")
def small_image():
    rng = np.random.default_rng(42)
    H, W = 40, 52
    chan = rng.integers(0, 256, (H, W)).astype(np.float32)
    return chan


def _packed_setup(chan, nr=5, nc=5, hx=30.0, hy=10.0, eps=1e-10):
    grid = sample_grid(*chan.shape, nr, nc)
    flat = chan.reshape(-1)[grid.perm]
    rr = (grid.perm // chan.shape[1]).astype(np.float32)
    cc = (grid.perm % chan.shape[1]).astype(np.float32)
    Um64, lam64, Uinv64 = ka_eigh_host64(
        chan[grid.sel_rows, grid.sel_cols], grid.sel_rows, grid.sel_cols,
        hx, hy, eps)
    sw, pw = bandwidth_weights(hx, hy)
    return grid, flat, rr, cc, Um64, lam64, Uinv64, sw, pw


def test_streaming_sinkhorn_matches_dense(small_image):
    from nle_tpu.ops.pallas.streaming_kernel import streaming_sinkhorn_vectors

    grid, flat, rr, cc, Um64, lam64, Uinv64, sw, pw = _packed_setup(small_image)
    p = grid.n_samples
    m = lam64.shape[0]
    f = features(jnp.asarray(rr), jnp.asarray(cc), jnp.asarray(flat))
    Um = jnp.asarray(Um64, jnp.float32)
    lam = jnp.asarray(lam64, jnp.float32)
    Uinv = jnp.asarray(Uinv64, jnp.float32)

    # Dense reference: phi assembled explicitly.
    from nle_tpu.ops.affinity import affinity_matmul_xla

    phi_b = affinity_matmul_xla(f[:p], f[p:], Uinv, sw, pw)
    phi = jnp.concatenate([Um, phi_b], axis=0)
    r_ref, c_ref = sinkhorn_vectors(phi, lam, 10, 1e-10)

    r, c = streaming_sinkhorn_vectors(
        f[:p], f[p:], Um, lam, Uinv, 10, 1e-10, sw, pw, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=2e-4, atol=1e-6)


def test_streaming_gram_matches_dense(small_image):
    from nle_tpu.ops.pallas.streaming_kernel import (
        streaming_scaled_gram_pallas,
    )

    grid, flat, rr, cc, Um64, lam64, Uinv64, sw, pw = _packed_setup(small_image)
    p = grid.n_samples
    m = lam64.shape[0]
    f = features(jnp.asarray(rr), jnp.asarray(cc), jnp.asarray(flat))
    Uinv = jnp.asarray(Uinv64, jnp.float32)
    rng = np.random.default_rng(3)
    q = grid.n_pixels - p
    cvec = jnp.asarray(rng.random(q).astype(np.float32))

    from nle_tpu.ops.affinity import affinity_matmul_xla

    phi_b = affinity_matmul_xla(f[:p], f[p:], Uinv, sw, pw)
    cphi = cvec[:, None] * phi_b
    want = np.asarray(cphi.T @ cphi)[:m, :m]

    qpad = -(-q // 512) * 512
    ppad = -(-p // 128) * 128
    mpad = -(-m // 128) * 128
    fa_rows = jnp.pad(f[:p].T, ((0, 0), (0, ppad - p)))
    fb_cols = jnp.pad(f[p:].T, ((0, 0), (0, qpad - q)))
    c_row = jnp.pad(cvec, (0, qpad - q))[None, :]
    uinv_pad = jnp.pad(Uinv, ((0, ppad - p), (0, mpad - m)))
    got = np.asarray(streaming_scaled_gram_pallas(
        fa_rows, fb_cols, c_row, uinv_pad, sw, pw, interpret=True))[:m, :m]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_train_filter_matches_dense(small_image):
    """End-to-end: train_filter with streaming forced vs the dense path.
    Eigenvector sign freedom is factored out per column."""
    kwargs = dict(hx=30.0, hy=10.0, n_sinkhorn_iter=10, n_eig_vectors=4)
    V_d, S_d = train_filter(small_image, 5, 5, streaming=False, **kwargs)
    V_s, S_s = train_filter(small_image, 5, 5, streaming=True, **kwargs)
    V_d, V_s = np.asarray(V_d), np.asarray(V_s)
    np.testing.assert_allclose(np.asarray(S_s), np.asarray(S_d),
                               rtol=1e-4, atol=1e-7)
    for j in range(V_d.shape[1]):
        sign = np.sign(np.dot(V_d[:, j], V_s[:, j])) or 1.0
        np.testing.assert_allclose(sign * V_s[:, j], V_d[:, j],
                                   rtol=5e-3, atol=2e-4)


def test_streaming_filtered_output_close(small_image):
    """The edit result (the user-visible artifact) from the streaming path
    matches the dense path to sub-LSB accuracy."""
    from nle_tpu.ops.pipeline import apply_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    weights = [1.0, 1.6, 1.3, 1.1]
    out = {}
    for mode in (False, True):
        V, S = train_filter(small_image, 5, 5, hx=30.0, hy=10.0,
                            n_sinkhorn_iter=10, n_eig_vectors=4,
                            streaming=mode)
        fS = transform_eigenvalues(S, jnp.asarray(weights, jnp.float32))
        out[mode] = np.asarray(apply_filter(V, fS, jnp.asarray(small_image)))
    assert np.abs(out[True] - out[False]).max() < 0.5


def test_streaming_dense_sampling_grid():
    """p = 2160 > MAX_STREAM_P_FUSED engages the two-pass p-tiled halfstep
    and the XLA-tiled Sb gram (formerly a hard ValueError); the edit result
    matches the dense pipeline within the config's intrinsic sensitivity.

    Tolerance note: dense sampling grids on real images truncate deeply
    (m ~ 103 of 2160 here), the regime the reference README flags as
    numerically touchy — a 1e-3 single-PIXEL perturbation moves the dense
    path's own output by ~5 gray levels (measured), and implementation-
    association noise lands well inside that cone (~1.3 levels). The
    kernel-level tests below pin the actual kernels at 1e-5. The
    eigenvalue rtol of 0.2 reflects the measured path-association envelope
    on this config: any ~1-ulp change to stage 2's inputs (e.g. where the
    Uinv = Um/lam division rounds, pack_stage1) re-rolls both paths inside
    a ~10% cone on the small trailing eigenvalues. The edit assert below is
    the real invariant; its 6.0 bound sits just above the config's OWN
    1e-3-perturbation cone (~5 levels) — a genuine algebra bug shows up as
    tens of levels or structured error, far outside it. Fidelity on the
    supported configs is enforced by the golden-PSNR gate, not here."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        MAX_STREAM_P_FUSED,
        gram_fits_vmem,
    )
    from nle_tpu.ops.pipeline import apply_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/data/bird.bmp")
    L = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[:160, :120, 0].astype(np.float32)
    p = 48 * 44
    assert p > MAX_STREAM_P_FUSED and not gram_fits_vmem(p, p)
    kwargs = dict(hx=200.0, hy=30.0, n_sinkhorn_iter=10, n_eig_vectors=4)
    V_s, S_s = train_filter(L, 48, 44, streaming=True, **kwargs)
    V_d, S_d = train_filter(L, 48, 44, streaming=False, **kwargs)
    np.testing.assert_allclose(np.asarray(S_s), np.asarray(S_d),
                               rtol=0.2, atol=1e-4)
    w = jnp.asarray([1.0, 2.0, 1.5, 1.1], jnp.float32)
    out_d = np.asarray(apply_filter(V_d, transform_eigenvalues(S_d, w),
                                    jnp.asarray(L)))
    out_s = np.asarray(apply_filter(V_s, transform_eigenvalues(S_s, w),
                                    jnp.asarray(L)))
    assert np.abs(out_s - out_d).max() < 6.0


def test_streaming_halfstep_ptiled_matches_single_pass(rng):
    """The two-pass p-tiled halfstep agrees with the single-pass kernel on
    a shape where both apply (ppad = 1024 is a PTILE multiple)."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_halfstep_pallas,
        streaming_halfstep_ptiled_pallas,
    )

    p, q = 1000, 1300
    fa = jnp.asarray(rng.integers(0, 64, (p, 3)), jnp.float32)
    fb = jnp.asarray(rng.integers(0, 64, (q, 3)), jnp.float32)
    fa_rows, fb_pad, mask = pad_stream_operands(fa, fb)
    assert fa_rows.shape[1] == 1024
    u = jnp.pad(jnp.asarray(rng.standard_normal(p), jnp.float32) * 0.01,
                (0, 1024 - p))
    args = (fa_rows, fb_pad, mask, u, 1e-4, 1e-3, 1e-10)
    x1, ap1 = streaming_halfstep_pallas(*args, interpret=True)
    x2, ap2 = streaming_halfstep_ptiled_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ap2)[:p], np.asarray(ap1)[:p],
                               rtol=1e-5, atol=1e-5)


def test_streaming_halfstep_dispatch_unit_x_large_p(rng):
    """The dispatcher's s0 route for dense grids (affinity matmul with the
    mask as right factor) matches the dense computation."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_halfstep,
    )

    p, q = 2500, 1100
    fa = jnp.asarray(rng.integers(0, 64, (p, 3)), jnp.float32)
    fb = jnp.asarray(rng.integers(0, 64, (q, 3)), jnp.float32)
    fa_rows, fb_pad, mask = pad_stream_operands(fa, fb)
    ppad = fa_rows.shape[1]
    assert ppad == 3072  # p-tiled regime
    sw, pw = 1e-4, 1e-3
    x, ap = streaming_halfstep(fa_rows, fb_pad, mask,
                               jnp.zeros((ppad,), jnp.float32),
                               sw, pw, 1e-10, unit_x=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(mask)[0])
    fa64, fb64 = np.asarray(fa, np.float64), np.asarray(fb, np.float64)
    A = np.exp(-(sw * ((fb64[:, None, 0] - fa64[None, :, 0]) ** 2
                       + (fb64[:, None, 1] - fa64[None, :, 1]) ** 2)
                 + pw * (fb64[:, None, 2] - fa64[None, :, 2]) ** 2))
    want = A.sum(axis=0)
    np.testing.assert_allclose(np.asarray(ap)[:p], want, rtol=1e-5, atol=1e-4)


def test_streaming_gram_xla_matches_pallas(rng):
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_scaled_gram_pallas,
        streaming_scaled_gram_xla,
    )

    p, q, m = 260, 1100, 140
    fa = jnp.asarray(rng.integers(0, 64, (p, 3)), jnp.float32)
    fb = jnp.asarray(rng.integers(0, 64, (q, 3)), jnp.float32)
    uinv = jnp.asarray(rng.standard_normal((p, m)), jnp.float32) * 0.05
    fa_rows, fb_cols, _ = pad_stream_operands(fa, fb)
    qpad = fb_cols.shape[1]
    c = jnp.pad(jnp.asarray(rng.random(q), jnp.float32), (0, qpad - q))[None, :]
    uinv_pad = jnp.pad(uinv, ((0, fa_rows.shape[1] - p), (0, 128 * 2 - m)))
    want = np.asarray(streaming_scaled_gram_pallas(
        fa_rows, fb_cols, c, uinv_pad, 1e-4, 1e-3, interpret=True))[:m, :m]
    got = np.asarray(streaming_scaled_gram_xla(
        fa, fb_cols, c, uinv, 1e-4, 1e-3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_tiny_and_fullgrid_edges():
    """q < TILE_Q and the full-grid (p == N, empty rest block) edge both
    work through the streaming stage 2."""
    rng = np.random.default_rng(9)
    small = rng.integers(0, 256, (12, 14)).astype(np.float32)
    V_s, S_s = train_filter(small, 3, 3, hx=20.0, hy=20.0, n_sinkhorn_iter=5,
                            n_eig_vectors=3, streaming=True)
    V_d, S_d = train_filter(small, 3, 3, hx=20.0, hy=20.0, n_sinkhorn_iter=5,
                            n_eig_vectors=3, streaming=False)
    np.testing.assert_allclose(np.asarray(S_s), np.asarray(S_d),
                               rtol=1e-4, atol=1e-7)
    # full grid: every pixel sampled -> empty rest block
    tiny = rng.integers(0, 256, (4, 5)).astype(np.float32)
    V_s, S_s = train_filter(tiny, 4, 5, hx=20.0, hy=20.0, n_sinkhorn_iter=5,
                            n_eig_vectors=2, streaming=True)
    V_d, S_d = train_filter(tiny, 4, 5, hx=20.0, hy=20.0, n_sinkhorn_iter=5,
                            n_eig_vectors=2, streaming=False)
    np.testing.assert_allclose(np.asarray(S_s), np.asarray(S_d),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.abs(np.asarray(V_s)), np.abs(np.asarray(V_d)),
                               rtol=1e-3, atol=1e-5)


def test_streaming_atb_matches_dense(rng):
    """K_AB^T @ b single-column kernel (the factored apply's tail)."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_atb_pallas,
    )

    for p, q in [(260, 1100), (2500, 700)]:
        fa = jnp.asarray(rng.integers(0, 64, (p, 3)), jnp.float32)
        fb = jnp.asarray(rng.integers(0, 64, (q, 3)), jnp.float32)
        fa_rows, fb_pad, _ = pad_stream_operands(fa, fb)
        ppad = fa_rows.shape[1]
        b = jnp.pad(jnp.asarray(rng.random(p), jnp.float32), (0, ppad - p))
        got = np.asarray(streaming_atb_pallas(fa_rows, fb_pad, b, 1e-4,
                                              1e-3, interpret=True))[0, :q]
        fa64, fb64 = np.asarray(fa, np.float64), np.asarray(fb, np.float64)
        A = np.exp(-(1e-4 * ((fb64[:, None, 0] - fa64[None, :, 0]) ** 2
                             + (fb64[:, None, 1] - fa64[None, :, 1]) ** 2)
                     + 1e-3 * (fb64[:, None, 2] - fa64[None, :, 2]) ** 2))
        want = A @ np.asarray(b, np.float64)[:p]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_streaming_multirow_ap_atb_match_single(rng):
    """The R-row generalization (multi-channel factored apply) must equal R
    independent single-row calls."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_ap_pallas,
        streaming_atb_pallas,
    )

    p, q, R = 260, 1100, 3
    fa = jnp.asarray(rng.integers(0, 64, (p, 3)), jnp.float32)
    fb = jnp.asarray(rng.integers(0, 64, (q, 3)), jnp.float32)
    fa_rows, fb_cols, _ = pad_stream_operands(fa, fb)
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    X = np.zeros((R, qpad), np.float32)
    X[:, :q] = rng.random((R, q)).astype(np.float32)
    got = np.asarray(streaming_ap_pallas(fa_rows, fb_cols, jnp.asarray(X),
                                         1e-4, 1e-3, interpret=True))
    for j in range(R):
        want = np.asarray(streaming_ap_pallas(
            fa_rows, fb_cols, jnp.asarray(X[j:j + 1]), 1e-4, 1e-3,
            interpret=True))[0]
        np.testing.assert_allclose(got[j], want, rtol=1e-6, atol=1e-6)
    B = np.zeros((R, ppad), np.float32)
    B[:, :p] = rng.random((R, p)).astype(np.float32)
    got_t = np.asarray(streaming_atb_pallas(fa_rows, fb_cols,
                                            jnp.asarray(B), 1e-4, 1e-3,
                                            interpret=True))
    for j in range(R):
        want = np.asarray(streaming_atb_pallas(
            fa_rows, fb_cols, jnp.asarray(B[j]), 1e-4, 1e-3,
            interpret=True))[0]
        np.testing.assert_allclose(got_t[j], want, rtol=1e-6, atol=1e-6)


def test_cross_path_consistency_fuzz():
    """Random configs through all three f32 execution paths — dense,
    streaming (phi-free), and the V-free factored filter — must agree on
    the user-visible edit output. Deterministic seeds: this is a breadth
    sweep over shapes/grids the fixed-config parity tests never visit."""
    from nle_tpu.models.factored import train_filter_factored
    from nle_tpu.ops.pipeline import apply_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    rng = np.random.default_rng(17)
    weights = jnp.asarray([1.0, 1.8, 1.4, 1.1], jnp.float32)
    for trial in range(4):
        nrows = int(rng.integers(12, 40))
        ncols = int(rng.integers(12, 40))
        nr = int(rng.integers(2, 7))
        nc = int(rng.integers(2, 7))
        hx = float(rng.uniform(20, 300))
        hy = float(rng.uniform(8, 60))
        k = int(rng.integers(2, 7))
        chan = rng.integers(0, 256, (nrows, ncols)).astype(np.float32)
        cfg = (trial, nrows, ncols, nr, nc, hx, hy, k)

        outs = {}
        for mode in (False, True):
            V, S = train_filter(chan, nr, nc, hx, hy, 8, k, streaming=mode)
            fS = transform_eigenvalues(S, weights)
            outs[mode] = np.asarray(apply_filter(V, fS, jnp.asarray(chan)))
        assert np.abs(outs[True] - outs[False]).max() < 0.5, cfg

        flt = train_filter_factored(chan, nr, nc, hx, hy, 8, k)
        fS_f = transform_eigenvalues(flt.eigvals, weights)
        out_f = flt.apply(chan, fS_f)
        assert np.abs(np.asarray(out_f) - outs[False]).max() < 0.5, cfg
