"""Color conversion and bilateral-filter parity with OpenCV (the reference's
color backend). OpenCV's 8-bit paths use fixed-point LUTs; the float
reimplementation is required to agree within 1-2 LSB."""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from nle_tpu.color.bilateral import bilateral_filter_u8
from nle_tpu.color.lab import bgr_to_lab_u8, lab_to_bgr_u8, luminance_channel


def _rand_img(rng, h=48, w=64):
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_bgr_to_lab_vs_opencv(rng):
    img = _rand_img(rng)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2Lab).astype(np.int32)
    got = np.asarray(bgr_to_lab_u8(jnp.asarray(img))).astype(np.int32)
    assert np.abs(got - want).max() <= 2
    assert np.abs(got - want).mean() < 0.2


def test_lab_to_bgr_vs_opencv(rng):
    img = _rand_img(rng)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    want = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR).astype(np.int32)
    got = np.asarray(lab_to_bgr_u8(jnp.asarray(lab))).astype(np.int32)
    assert np.abs(got - want).max() <= 2


def test_luminance_channel_is_8bit_L(rng):
    img = _rand_img(rng)
    L = np.asarray(luminance_channel(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[..., 0].astype(np.float64)
    assert np.abs(L - want).max() <= 1.0
    # integer-valued floats in [0, 255]
    assert L.min() >= 0 and L.max() <= 255
    np.testing.assert_array_equal(L, np.rint(L))


@pytest.mark.parametrize("sigma_color,sigma_space", [(10, 10), (30, 5), (75, 3)])
def test_bilateral_vs_opencv(rng, sigma_color, sigma_space):
    img = rng.integers(0, 256, (40, 56), np.uint8)
    want = cv2.bilateralFilter(img, -1, sigma_color, sigma_space).astype(np.int32)
    got = np.asarray(
        bilateral_filter_u8(jnp.asarray(img), -1, sigma_color, sigma_space)
    ).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02
