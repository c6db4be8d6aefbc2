"""Denoise (GLIDE) path parity: the spectral part against the oracle, using
our bilateral output as the common training signal (isolates the spectral
math from the ±1 LSB bilateral differences that chaos would amplify)."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.color.bilateral import bilateral_filter_u8
from nle_tpu.ops.pipeline import apply_filter, train_filter
from nle_tpu.ops.transform import shrink_eigenvalues


def test_denoise_spectral_matches_oracle(rng):
    h, w = 24, 32
    lab_l = rng.integers(0, 256, (h, w), np.uint8)
    ab = rng.integers(0, 256, (h, w), np.uint8).astype(np.float64)
    bf = np.asarray(bilateral_filter_u8(jnp.asarray(lab_l), -1, 10, 10))
    chan = bf.astype(np.float64)

    args = (3, 4, 100.0, 30.0, 5, 5)
    V_o, S_o = O.train_filter(chan, *args)
    shrink = 2.0
    teig_o = np.minimum(S_o, 1.0) ** shrink
    out_o = O.apply_filter(V_o, teig_o, ab)

    V, S = train_filter(chan, *args, dtype=jnp.float64, use_pallas=False)
    teig = shrink_eigenvalues(S, shrink)
    np.testing.assert_allclose(np.asarray(teig)[: S_o.size], teig_o, atol=1e-10)
    out = np.asarray(apply_filter(V, teig, jnp.asarray(ab)))
    np.testing.assert_allclose(out, out_o, atol=1e-8)


def test_bilateral_aperture_matches_reference_rule():
    # d = -1 -> radius = round(1.5 * sigma_space) like cv::bilateralFilter.
    from nle_tpu.color.bilateral import _aperture

    assert _aperture(-1, 10) == 15
    assert _aperture(-1, 3) == 4  # round(4.5) = 4 (banker's) vs cv round half away?
    assert _aperture(7, 99) == 3
