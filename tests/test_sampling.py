"""Sampling-grid parity with the reference samplePixels (src/filter.cpp:56-80)."""

import numpy as np
import pytest

import oracle_numpy as O
from nle_tpu.ops.sampling import sample_grid


@pytest.mark.parametrize(
    "nrows,ncols,nr,nc",
    [
        (10, 10, 3, 3),
        (12, 9, 5, 3),
        (8, 8, 4, 4),
        (267, 400, 10, 20),
        (501, 365, 10, 20),
        (100, 37, 7, 5),
        (9, 31, 9, 31),
    ],
)
def test_matches_oracle(nrows, ncols, nr, nc):
    sel, rest = O.sample_pixels(nrows, ncols, nr, nc)
    g = sample_grid(nrows, ncols, nr, nc)
    np.testing.assert_array_equal(g.sel_rows, [r for r, _ in sel])
    np.testing.assert_array_equal(g.sel_cols, [c for _, c in sel])
    exp_perm = np.array([r * ncols + c for (r, c) in sel + rest])
    np.testing.assert_array_equal(g.perm, exp_perm)
    assert g.n_samples == len(sel)
    assert g.n_pixels == nrows * ncols


def test_rejects_oversampling():
    with pytest.raises(ValueError):
        sample_grid(5, 5, 6, 3)
    with pytest.raises(ValueError):
        sample_grid(5, 5, 3, 6)


def test_perm_is_permutation():
    g = sample_grid(23, 17, 4, 6)
    assert np.array_equal(np.sort(g.perm), np.arange(23 * 17))
    inv = g.unpack_indices()
    assert np.array_equal(g.perm[inv], np.arange(23 * 17))


def test_pack_reorders_by_perm():
    g = sample_grid(23, 17, 4, 6)
    x = np.arange(23 * 17, dtype=np.float32)
    packed = g.pack(x)
    assert np.array_equal(packed, x[g.perm])
    # Selected pixels lead the packed order (the [selected; rest] layout).
    sel_flat = g.sel_rows * 17 + g.sel_cols
    assert np.array_equal(packed[: g.n_samples], sel_flat.astype(np.float32))
    # Works on (N, ...) arrays too.
    x2 = np.stack([x, -x], axis=1)
    assert np.array_equal(g.pack(x2), x2[g.perm])
