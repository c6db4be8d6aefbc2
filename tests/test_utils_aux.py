"""Auxiliary utilities: Y channel, top-k eigensolver, visualization,
index math, image I/O."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.linalg import topk_eigendecomposition
from nle_tpu.utils.indexing import to_1d_index, to_2d_coords
from nle_tpu.utils.visualize import (
    eigvec_images,
    plot_sampled_points,
    rescale_for_visualization,
)


def test_index_roundtrip():
    assert to_1d_index(3, 4, 10) == 34
    assert to_2d_coords(34, 10) == (3, 4)


def test_y_channel_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    from nle_tpu.color.lab import y_channel

    img = rng.integers(0, 256, (32, 40, 3), np.uint8)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)[..., 0].astype(int)
    got = np.asarray(y_channel(jnp.asarray(img))).astype(int)
    assert np.abs(want - got).max() <= 1


def test_topk_matches_full_eigh(rng):
    M = rng.random((30, 30))
    M = (M + M.T) / 2 + 30 * np.eye(30)
    U_full, lam_full = O.eigen_decomposition(M)
    U, lam = topk_eigendecomposition(M, 5)
    np.testing.assert_allclose(lam, lam_full[:5], atol=1e-8)
    np.testing.assert_allclose(np.abs(U), np.abs(U_full[:, :5]), atol=1e-7)


def test_topk_clamps_k(rng):
    M = np.eye(4) * np.arange(1, 5)[::-1]
    U, lam = topk_eigendecomposition(M, 10)
    assert lam.size == 3  # k clamped to n-1 (reference src/filter.cpp:172)


def test_rescale_for_visualization():
    out = rescale_for_visualization(np.array([[1.0, 2.0], [3.0, 5.0]]))
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # constant input must not divide by zero
    flat = rescale_for_visualization(np.ones((3, 3)))
    assert (flat == 0).all()


def test_plot_sampled_points(rng):
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    out = plot_sampled_points(img, 3, 4)
    assert out.shape == img.shape
    assert (out != img).any()
    assert (img == np.asarray(img)).all()  # original untouched


def test_eigvec_images(rng):
    from nle_tpu.models.filter import NLEFilter

    img = rng.integers(0, 256, (16, 20, 3), np.uint8)
    f = NLEFilter()
    f.train_for_enhancement(img, 3, 4, 100, 30, 5, 5)
    imgs = eigvec_images(f.trained)
    assert len(imgs) == 5
    assert imgs[0].shape == (16, 20)
    # Content check: the rendering must be of PIXEL-order rows (the model
    # stores eigenvectors packed; a raw reshape would be scrambled).
    want = rescale_for_visualization(
        f.trained.eigvecs_pixel_order()[:, 0]
    ).reshape(16, 20)
    np.testing.assert_array_equal(imgs[0], want)


def test_imageio_roundtrip(tmp_path, rng):
    from nle_tpu.utils.imageio import imread_bgr, imwrite_bgr

    img = rng.integers(0, 256, (10, 12, 3), np.uint8)
    path = str(tmp_path / "t.png")
    imwrite_bgr(path, img)
    back = imread_bgr(path)
    np.testing.assert_array_equal(img, back)
    with pytest.raises(FileNotFoundError):
        imread_bgr(str(tmp_path / "missing.png"))
