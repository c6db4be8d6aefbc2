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


def test_imageio_pil_fallback_matches_cv2(tmp_path, rng, monkeypatch):
    """The Pillow fallback (cv2-less hosts) must present the cv2 contract:
    same decoded pixels, FileNotFoundError for unreadable files (the CLIs
    catch exactly that), ValueError for undecodable bytes (the HTTP layer
    maps it to 400)."""
    from nle_tpu.utils import imageio

    img = rng.integers(0, 256, (9, 11, 3), np.uint8)
    path = str(tmp_path / "t.png")
    imageio.imwrite_bgr(path, img)
    with open(path, "rb") as fh:
        png = fh.read()

    monkeypatch.setattr(imageio, "_HAVE_CV2", False)
    np.testing.assert_array_equal(imageio.imread_bgr(path), img)
    np.testing.assert_array_equal(imageio.imdecode_bgr(png), img)
    with pytest.raises(FileNotFoundError):
        imageio.imread_bgr(str(tmp_path / "missing.png"))
    corrupt = str(tmp_path / "corrupt.png")
    with open(corrupt, "wb") as fh:
        fh.write(b"not an image")
    with pytest.raises(FileNotFoundError):
        imageio.imread_bgr(corrupt)
    with pytest.raises(ValueError):
        imageio.imdecode_bgr(b"not an image")

    # PIL decodes lazily: a TRUNCATED file passes Image.open (the header
    # is intact) and only errors inside convert() — the error contract
    # must still hold (FileNotFoundError for files, ValueError for bytes;
    # an escaped OSError would crash batch runs / return HTTP 500s).
    big = rng.integers(0, 256, (80, 100, 3), np.uint8)
    monkeypatch.setattr(imageio, "_HAVE_CV2", True)
    bigpath = str(tmp_path / "big.png")
    imageio.imwrite_bgr(bigpath, big)
    with open(bigpath, "rb") as fh:
        bigpng = fh.read()
    truncated = bigpng[: len(bigpng) // 2]
    truncpath = str(tmp_path / "trunc.png")
    with open(truncpath, "wb") as fh:
        fh.write(truncated)
    monkeypatch.setattr(imageio, "_HAVE_CV2", False)
    with pytest.raises(FileNotFoundError):
        imageio.imread_bgr(truncpath)
    with pytest.raises(ValueError):
        imageio.imdecode_bgr(truncated)


def test_imageio_pil_fallback_applies_exif_orientation(tmp_path, monkeypatch):
    """cv2.imread applies EXIF orientation; the PIL path must match
    (regression: it returned the un-rotated array)."""
    from PIL import Image

    from nle_tpu.utils import imageio

    # 10x20 RGB JPEG tagged Orientation=6 (rotate 90 CW on display).
    src = np.zeros((20, 10, 3), np.uint8)
    src[:10] = 255
    path = str(tmp_path / "exif.jpg")
    im = Image.fromarray(src)
    exif = im.getexif()
    exif[0x0112] = 6
    im.save(path, exif=exif.tobytes())

    want = imageio.imread_bgr(path)          # cv2 path (applies EXIF)
    monkeypatch.setattr(imageio, "_HAVE_CV2", False)
    got = imageio.imread_bgr(path)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
