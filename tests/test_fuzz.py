"""Randomized fuzz coverage: sampling-rule parity over many shapes, color
bit-exactness over many seeds, legacy (pixel-order) filter format."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.sampling import sample_grid


def test_sampling_fuzz_vs_oracle():
    rng = np.random.default_rng(42)
    for _ in range(60):
        nrows = int(rng.integers(2, 120))
        ncols = int(rng.integers(2, 120))
        nr = int(rng.integers(1, nrows + 1))
        nc = int(rng.integers(1, ncols + 1))
        sel, rest = O.sample_pixels(nrows, ncols, nr, nc)
        g = sample_grid(nrows, ncols, nr, nc)
        assert g.n_samples == len(sel), (nrows, ncols, nr, nc)
        exp = np.array([r * ncols + c for (r, c) in sel + rest])
        np.testing.assert_array_equal(g.perm, exp)


def test_forward_lab_bit_exact_fuzz():
    cv2 = pytest.importorskip("cv2")
    from nle_tpu.color.lab import bgr_to_lab_u8_np

    rng = np.random.default_rng(7)
    for _ in range(6):
        img = rng.integers(0, 256, (97, 61, 3), np.uint8)
        want = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
        got = bgr_to_lab_u8_np(img)
        np.testing.assert_array_equal(got, want)


def test_legacy_pixel_order_filter(rng, tmp_path):
    """A TrainedFilter without perm (pixel-order rows, the pre-packed
    format) still applies and saves/loads correctly."""
    from nle_tpu.models.filter import NLEFilter, TrainedFilter
    from nle_tpu.ops.pipeline import train_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    img = rng.integers(0, 256, (16, 20, 3), np.uint8)
    f = NLEFilter()
    f.train_for_enhancement(img, 3, 4, 100, 30, 5, 5)
    want = f.enhance(img, [2, 3, 4, 1])

    t = f.trained
    legacy = TrainedFilter(
        jnp.asarray(t.eigvecs_pixel_order()), t.eigvals, t.nrows, t.ncols,
        perm=None,
    )
    path = str(tmp_path / "legacy.npz")
    legacy.save(path)
    g = NLEFilter(trained=TrainedFilter.load(path))
    got = g.enhance(img, [2, 3, 4, 1])
    np.testing.assert_array_equal(got, want)


def test_train_filter_fuzz_vs_oracle():
    """Random (shape, grid, bandwidth, iters, k) draws through the full
    f64 pipeline vs the NumPy oracle — catches boundary regressions
    (heavy eps-truncation from tiny hy, single-row grids, k > m clamps)
    that the fixed-shape tests never visit."""
    from nle_tpu.ops.pipeline import train_filter

    rng = np.random.default_rng(3)
    for trial in range(8):
        nrows = int(rng.integers(5, 26))
        ncols = int(rng.integers(5, 26))
        nr = int(rng.integers(1, min(6, nrows) + 1))
        nc = int(rng.integers(1, min(6, ncols) + 1))
        hx = float(rng.uniform(5, 500))
        hy = float(rng.uniform(2, 80))
        # >= 1: the reference's c vector is uninitialized at maxIter=0
        # (so is the oracle's) — the 0-iteration edge has its own
        # pinned-behavior test in the pipeline suite.
        iters = int(rng.integers(1, 7))
        k = int(rng.integers(1, 9))
        chan = rng.integers(0, 256, (nrows, ncols)).astype(np.float64)
        V_o, S_o = O.train_filter(chan, nr, nc, hx, hy, iters, k)
        V, S = train_filter(chan, nr, nc, hx, hy, iters, k,
                            dtype=jnp.float64, use_pallas=False)
        cfg = (trial, nrows, ncols, nr, nc, hx, hy, iters, k)
        np.testing.assert_allclose(np.asarray(S)[: S_o.size], S_o,
                                   atol=1e-9, err_msg=str(cfg))
        # Eigenvector parity up to per-column sign.
        Vn = np.asarray(V)[:, : S_o.size]
        for j in range(S_o.size):
            d = min(np.abs(Vn[:, j] - V_o[:, j]).max(),
                    np.abs(Vn[:, j] + V_o[:, j]).max())
            assert d < 1e-8, (cfg, j, d)
