"""NumPy float64 oracle for the nonlocal-image-edit algorithm.

This is a *specification* of the reference pipeline (see SURVEY.md and the
upstream C++ at reference src/filter.cpp) written in plain NumPy float64. It is
used only by the test-suite as the ground-truth the TPU implementation is
checked against; it is intentionally simple and dense, with no TPU concerns.

Semantics mirrored from the reference (citations are reference file:line):
  - samplePixels grid offsets            src/filter.cpp:56-80
  - affinity kernel exp(-d2s/hx^2-d2i/hy^2)  src/filter.cpp:104-145
  - eigenDecomposition descending + eps-truncation  src/filter.cpp:204-228
  - nystromApproximation                 src/filter.cpp:257-280
  - sinkhorn factored balancing          src/filter.cpp:230-254
  - orthogonalize one-shot               src/filter.cpp:282-331
  - transformEigenValues                 src/filter.cpp:334-347
  - enhance / denoise / apply            src/filter.cpp:349-458
"""

import numpy as np

EPS = 1e-10


def sample_pixels(nrows, ncols, n_row_samples, n_col_samples):
    """Return (selected, rest) lists of (r, c), row-major ordered."""
    row_step = nrows // n_row_samples
    col_step = ncols // n_col_samples
    row_off = (row_step - 1 + (nrows - row_step * n_row_samples)) // 2
    col_off = (col_step - 1 + (ncols - col_step * n_col_samples)) // 2
    selected, rest = [], []
    for r in range(nrows):
        for c in range(ncols):
            if (
                r >= row_off
                and c >= col_off
                and r <= nrows - row_off
                and c <= ncols - col_off
                and (r - row_off) % row_step == 0
                and (c - col_off) % col_step == 0
            ):
                selected.append((r, c))
            else:
                rest.append((r, c))
    return selected, rest


def compute_kernel(channel, n_row_samples, n_col_samples, hx, hy):
    """Return (perm, Ka, Kab); perm maps packed [selected; rest] -> flat index."""
    nrows, ncols = channel.shape
    if n_row_samples > nrows or n_col_samples > ncols:
        raise ValueError("Number of samples per row and col must be <= that of image.")
    sel, rest = sample_pixels(nrows, ncols, n_row_samples, n_col_samples)
    pts = np.array(sel + rest, dtype=np.float64)  # (N,2)
    y = channel[pts[:, 0].astype(int), pts[:, 1].astype(int)].astype(np.float64)
    p = len(sel)
    sw = 1.0 / (hx * hx)
    pw = 1.0 / (hy * hy)
    d2s = (
        (pts[:p, 0:1] - pts[None, :, 0]) ** 2 + (pts[:p, 1:2] - pts[None, :, 1]) ** 2
    ).reshape(p, -1)
    d2i = (y[:p, None] - y[None, :]) ** 2
    K = np.exp(-sw * d2s - pw * d2i)  # (p, N)
    Ka = K[:, :p]
    Kab = K[:, p:]
    perm = np.array([r * ncols + c for (r, c) in sel + rest], dtype=np.int64)
    return perm, Ka, Kab


def inplace_reciprocal(v, eps=EPS):
    out = np.where(np.abs(v) >= eps, 1.0 / np.where(v == 0, 1.0, v), 0.0)
    return out, int(np.count_nonzero(np.abs(v) >= eps))


def eigen_decomposition(M, eps=EPS):
    D, U = np.linalg.eigh(M)
    D = D[::-1]
    U = U[:, ::-1]
    r = 0
    while r < D.size and D[r] >= eps:
        r += 1
    return U[:, :r].copy(), D[:r].copy()


def nystrom_approximation(Ka, Kab):
    U, lam = eigen_decomposition(Ka)
    lam_inv, nnz = inplace_reciprocal(lam)
    U = U[:, :nnz]
    lam = lam[:nnz]
    lam_inv = lam_inv[:nnz]
    phi_b = Kab.T @ (U * lam_inv[None, :])
    phi = np.vstack([U, phi_b])
    return lam, phi


def sinkhorn(phi, eigvals, max_iter=10):
    n = phi.shape[0]
    r = np.ones(n)
    c = None
    for _ in range(max_iter):
        c, _ = inplace_reciprocal(phi @ (eigvals * (phi.T @ r)))
        r, _ = inplace_reciprocal(phi @ (eigvals * (phi.T @ c)))
    p = phi.shape[1]
    Ga = phi[:p] * eigvals[None, :]
    Wa = (r[:p, None] * Ga) @ (c[:p, None] * phi[:p]).T
    Wab = (r[:p, None] * Ga) @ (c[p:, None] * phi[p:]).T
    return Wa, Wab


def orthogonalize(Wa, Wab, n_eig_vectors=5, eps=EPS):
    U, lam = eigen_decomposition(Wa)
    inv_root, _ = inplace_reciprocal(lam, eps)
    inv_root = np.sqrt(inv_root)
    inv_root_wa = (U * inv_root[None, :]) @ U.T
    Q = Wa + inv_root_wa @ (Wab @ Wab.T) @ inv_root_wa
    Vq, Sq = eigen_decomposition(Q, eps)
    k = min(n_eig_vectors, Vq.shape[1])
    Vq = Vq[:, :k]
    Sq = Sq[:k]
    inv_root_sq, _ = inplace_reciprocal(Sq, eps)
    inv_root_sq = np.sqrt(inv_root_sq)
    tmp = np.vstack([Wa, Wab.T])
    V = tmp @ inv_root_wa @ Vq @ np.diag(inv_root_sq)
    return V, Sq


def transform_eigenvalues(eigvals, weights):
    fS = np.full(eigvals.shape, weights[0], dtype=np.float64)
    for k in range(1, len(weights)):
        fS += (weights[k] - weights[k - 1]) * eigvals**k
    return fS


def train_filter(channel, n_row_samples, n_col_samples, hx, hy, n_sinkhorn_iter, n_eigen_vectors):
    perm, Ka, Kab = compute_kernel(channel, n_row_samples, n_col_samples, hx, hy)
    lam, phi = nystrom_approximation(Ka, Kab)
    Wa, Wab = sinkhorn(phi, lam, n_sinkhorn_iter)
    V, S = orthogonalize(Wa, Wab, n_eigen_vectors)
    Vp = np.zeros_like(V)
    Vp[perm] = V  # permute packed rows back to pixel order (src/filter.cpp:502)
    return Vp, S


def apply_filter(V, fS, channel):
    c = channel.reshape(-1).astype(np.float64)
    return (V @ (fS * (V.T @ c))).reshape(channel.shape)


def bgr2lab_u8(image_bgr_u8):
    import cv2

    return cv2.cvtColor(image_bgr_u8, cv2.COLOR_BGR2Lab)


def lab2bgr_u8(lab_u8):
    import cv2

    return cv2.cvtColor(lab_u8, cv2.COLOR_Lab2BGR)


def enhance_image(image_bgr_u8, n_row_samples, n_col_samples, hx, hy,
                  n_sinkhorn_iter, n_eigen_vectors, weights):
    """Full reference enhance pipeline on a BGR u8 image."""
    lab = bgr2lab_u8(image_bgr_u8)
    L = lab[..., 0].astype(np.float64)
    V, S = train_filter(L, n_row_samples, n_col_samples, hx, hy,
                        n_sinkhorn_iter, n_eigen_vectors)
    fS = transform_eigenvalues(S, weights)
    Lf = apply_filter(V, fS, L)
    Lf = np.clip(np.rint(Lf), 0, 255).astype(np.uint8)
    out = lab.copy()
    out[..., 0] = Lf
    return lab2bgr_u8(out)


def psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0**2 / mse)
