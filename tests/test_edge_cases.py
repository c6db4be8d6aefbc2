"""Edge cases: extreme sampling densities, tiny images, k handling."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.models.filter import NLEFilter
from nle_tpu.ops.pipeline import train_filter
from nle_tpu.ops.sampling import sample_grid


def test_sample_every_pixel(rng):
    # nRowSamples == nrows, nColSamples == ncols: everything selected.
    chan = rng.integers(0, 256, (6, 7)).astype(np.float64)
    g = sample_grid(6, 7, 6, 7)
    assert g.n_samples == 42
    V_o, S_o = O.train_filter(chan, 6, 7, 50.0, 30.0, 5, 3)
    V, S = train_filter(chan, 6, 7, 50.0, 30.0, 5, 3, dtype=jnp.float64,
                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(S)[: S_o.size], S_o, atol=1e-9)


def test_single_sample_row_col(rng):
    chan = rng.integers(0, 256, (9, 11)).astype(np.float64)
    V_o, S_o = O.train_filter(chan, 1, 1, 50.0, 30.0, 3, 2)
    V, S = train_filter(chan, 1, 1, 50.0, 30.0, 3, 2, dtype=jnp.float64,
                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(S)[: S_o.size], S_o, atol=1e-9)


def test_k_larger_than_m(rng):
    # Requesting more eigenvectors than the spectrum supports: k clamps to m.
    chan = rng.integers(0, 256, (8, 8)).astype(np.float64)
    V, S = train_filter(chan, 2, 2, 50.0, 30.0, 3, 50, dtype=jnp.float64,
                        use_pallas=False)
    assert S.shape[0] <= 4
    V_o, S_o = O.train_filter(chan, 2, 2, 50.0, 30.0, 3, 50)
    np.testing.assert_allclose(np.asarray(S)[: S_o.size], S_o, atol=1e-9)


def test_tiny_image_enhance(rng):
    img = rng.integers(0, 256, (4, 5, 3), np.uint8)
    f = NLEFilter()
    f.train_for_enhancement(img, 2, 2, 100, 30, 3, 3)
    out = f.enhance(img, [2.0, 1.0])
    assert out.shape == img.shape


def test_single_weight(rng):
    # weights = [w0] only: f(S) == w0 for every eigenvalue.
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    f = NLEFilter()
    f.train_for_enhancement(img, 2, 2, 100, 30, 3, 3)
    out = f.enhance(img, [1.0])
    assert out.shape == img.shape


def test_nonsquare_extreme_aspect(rng):
    chan = rng.integers(0, 256, (2, 64)).astype(np.float64)
    V_o, S_o = O.train_filter(chan, 2, 4, 50.0, 30.0, 3, 3)
    V, S = train_filter(chan, 2, 4, 50.0, 30.0, 3, 3, dtype=jnp.float64,
                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(S)[: S_o.size], S_o, atol=1e-9)

def test_lab_cache_survives_inplace_mutation(rng):
    # The one-entry Lab cache must key on pixel CONTENT snapshots: mutating
    # the same array object in place between calls has to produce a fresh
    # conversion, not the stale cached Lab (regression: an identity
    # shortcut compared the cached object to itself, vacuously equal).
    from nle_tpu.color.lab import bgr_to_lab_u8_np

    img = rng.integers(0, 256, (6, 5, 3), np.uint8)
    f = NLEFilter()
    lab1 = f._to_lab(img)
    np.testing.assert_array_equal(lab1, bgr_to_lab_u8_np(img))
    img[:] = 255 - img
    lab2 = f._to_lab(img)
    np.testing.assert_array_equal(lab2, bgr_to_lab_u8_np(img))
    assert not np.array_equal(lab1, lab2)
    # Unchanged content still hits the cache (same object returned).
    assert f._to_lab(img) is lab2


def test_eigvec_images_accepts_prefetched_v(rng):
    # cli/common.py fetches V once and reuses it for both the stats print
    # and the image dump; the V= path must match the self-fetch path.
    from nle_tpu.utils.visualize import eigvec_images

    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    f = NLEFilter()
    t = f.train_for_enhancement(img, 2, 2, 100, 30, 3, 3)
    auto = eigvec_images(t)
    given = eigvec_images(t, V=t.eigvecs_pixel_order())
    assert len(auto) == len(given)
    for a, g in zip(auto, given):
        np.testing.assert_array_equal(a, g)
