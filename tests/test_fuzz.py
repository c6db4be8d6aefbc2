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
