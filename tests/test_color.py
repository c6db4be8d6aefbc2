"""Color conversion and bilateral-filter parity with OpenCV (the reference's
color backend). OpenCV's 8-bit paths use fixed-point LUTs; the float
reimplementation is required to agree within 1-2 LSB."""

import os

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
    want = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
    got = np.asarray(lab_to_bgr_u8(jnp.asarray(lab)))
    np.testing.assert_array_equal(got, want)


def test_lab_to_bgr_bit_exact_all_paths(rng):
    """jit, NumPy, and native-C inverse paths all equal cv2 exactly,
    including the Lab-cube extremes (corners + axes + random interior)."""
    from nle_tpu.color.lab import _native, lab_to_bgr_u8_np

    corners = np.stack(np.meshgrid([0, 255], [0, 255], [0, 255],
                                   indexing="ij"), -1).reshape(-1, 3)
    axes = np.stack([np.arange(256)] * 3, -1)
    rand = rng.integers(0, 256, (4096, 3))
    lab = np.concatenate([corners, axes, rand]).astype(np.uint8)
    lab = lab[: (lab.shape[0] // 4) * 4].reshape(-1, 4, 3)
    want = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
    np.testing.assert_array_equal(np.asarray(lab_to_bgr_u8(jnp.asarray(lab))), want)
    np.testing.assert_array_equal(lab_to_bgr_u8_np(lab), want)
    if _native() is not None:
        from nle_tpu import native as nat
        from nle_tpu.color import lab as labmod

        got = nat.lab2bgr_u8(lab, labmod._IY_TAB, labmod._IFY_TAB,
                             labmod._IAB_TAB, labmod._IMIN_AB,
                             labmod._ICOEFFS, labmod._IGAMMA_TAB,
                             labmod._IADIV_TAB, labmod._IBDIV_TAB)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(os.environ.get("NLE_RUN_FULL_GOLDEN") != "1",
                    reason="full 256^3 cube check is slow; NLE_RUN_FULL_GOLDEN=1")
def test_lab_to_bgr_bit_exact_full_cube():
    from nle_tpu.color.lab import lab_to_bgr_u8_np

    L, A, B = np.meshgrid(np.arange(256, dtype=np.uint8),
                          np.arange(256, dtype=np.uint8),
                          np.arange(256, dtype=np.uint8), indexing="ij")
    lab = np.stack([L, A, B], axis=-1).reshape(4096, 4096, 3)
    want = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)
    np.testing.assert_array_equal(lab_to_bgr_u8_np(lab), want)


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


def test_bgr_to_lab_float_formula_within_2lsb(rng):
    """The float-formula forward conversion (the documented cross-check of
    the integer LUT pipeline, color/lab.py module docstring) stays within
    +-2 LSB of OpenCV on random images. It is NOT the training path — the
    LUT pipeline is bit-exact and training is chaotic in L — but its
    agreement bound is what validates the LUT constants."""
    from nle_tpu.color.lab import bgr_to_lab_u8_float

    img = _rand_img(rng, 64, 80)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2Lab).astype(np.int32)
    got = np.asarray(bgr_to_lab_u8_float(jnp.asarray(img))).astype(np.int32)
    assert np.abs(got - want).max() <= 2
    assert np.abs(got - want).mean() < 0.2


def test_native_rebuild_from_source(tmp_path, monkeypatch, rng):
    """Force the build-on-import path (native/__init__.py _build): compile
    labcolor.c fresh into a temp location, load it, and check the forward
    conversion is bit-exact vs cv2 — covering the stale-marker rebuild,
    the temp-compile + atomic-replace flow, and the ctypes wiring."""
    from nle_tpu import native as nat
    from nle_tpu.color import lab as labmod

    so = tmp_path / "_labcolor.so"
    marker = tmp_path / "_labcolor.built"
    monkeypatch.setattr(nat, "_SO", str(so))
    monkeypatch.setattr(nat, "_MARKER", str(marker))
    monkeypatch.setattr(nat, "_lib", None)
    lib = nat.load()
    if lib is None:
        pytest.skip("no C compiler available")
    assert so.exists() and marker.exists()
    img = _rand_img(rng, 32, 48)
    got = nat.bgr2lab_u8(img, labmod._GAMMA_TAB, labmod._CBRT_TAB,
                         labmod._XYZ_COEFFS, labmod._L_SCALE, labmod._L_SHIFT)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    np.testing.assert_array_equal(got, want)
