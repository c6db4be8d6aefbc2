"""V-free factored filter (models/factored.py): the tail rows of V are
regenerated from training features at apply time — results must match the
dense TrainedFilter path to streaming-association noise."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.models.factored import FactoredFilter, train_filter_factored
from nle_tpu.models.filter import NLEFilter, load_filter
from nle_tpu.ops.pipeline import apply_filter, train_filter
from nle_tpu.ops.transform import transform_eigenvalues


@pytest.fixture()
def image(rng):
    return rng.integers(0, 256, (60, 70)).astype(np.float32)


ARGS = (5, 6, 300.0, 40.0, 8, 4)
W = [1.0, 2.0, 1.5, 1.1]


def test_factored_apply_matches_dense(image):
    ff = train_filter_factored(image, *ARGS)
    V, S = train_filter(image, *ARGS)
    np.testing.assert_allclose(np.asarray(ff.eigvals), np.asarray(S),
                               rtol=1e-4, atol=1e-6)
    w = jnp.asarray(W, jnp.float32)
    out_d = np.asarray(apply_filter(V, transform_eigenvalues(S, w),
                                    jnp.asarray(image)))
    out_f = ff.apply(image, transform_eigenvalues(ff.eigvals, w))
    assert np.abs(out_f - out_d).max() < 0.05


def test_factored_apply_u8_multichannel(image, rng):
    """(H, W, C) channels (the denoise chroma pair) ride ONE batched pair
    of streaming passes and match the per-channel float path after clamp."""
    ff = train_filter_factored(image, *ARGS)
    fS = transform_eigenvalues(ff.eigvals, jnp.asarray(W, jnp.float32))
    chans = rng.integers(0, 256, (60, 70, 2)).astype(np.uint8)
    got = ff.apply_u8(chans, fS)
    for j in range(2):
        want = np.clip(np.rint(ff.apply(chans[..., j].astype(np.float32),
                                        fS)), 0, 255)
        assert np.abs(got[..., j].astype(np.float64) - want).max() <= 1.0


def test_factored_apply_u8_per_channel_branch(image, rng, monkeypatch):
    """The capacity-size dispatch (per-channel passes above
    NLE_FACTORED_BATCH_PIXELS) must agree exactly with the batched
    channel-major branch — it only ever runs on multi-MP TPU jobs
    otherwise."""
    ff = train_filter_factored(image, *ARGS)
    fS = transform_eigenvalues(ff.eigvals, jnp.asarray(W, jnp.float32))
    chans = rng.integers(0, 256, (60, 70, 2)).astype(np.uint8)
    batched = ff.apply_u8(chans, fS)
    monkeypatch.setenv("NLE_FACTORED_BATCH_PIXELS", "1")
    per_channel = ff.apply_u8(chans, fS)
    # The R-row and single-row kernels may associate sums differently;
    # after the rint clamp that is at most 1 LSB on .5-boundary pixels.
    diff = np.abs(per_channel.astype(np.int16) - batched.astype(np.int16))
    assert diff.max() <= 1


def test_nlefilter_factored_enhance_matches_dense():
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/data/flower-50.bmp")
    img = img[:100, :120]
    params = (6, 8, 100.0, 30.0, 10, 6)
    weights = [2.0, 3.0, 4.0, 1.0, 1.0, 1.0]
    f_d = NLEFilter()
    f_d.train_for_enhancement(img, *params)
    out_d = f_d.enhance(img, weights)
    f_f = NLEFilter(factored=True)
    f_f.train_for_enhancement(img, *params)
    out_f = f_f.enhance(img, weights)
    # u8 outputs: identical up to clamp boundaries (~2 LSB — the factored
    # path's streaming association + channel-major matmul order differ
    # from the dense path at f32 rounding level)
    assert np.abs(out_f.astype(int) - out_d.astype(int)).max() <= 2


def test_factored_denoise_runs(image):
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/data/taj-rgb-noise.jpg")[:80, :90]
    f = NLEFilter(factored=True)
    f.train_for_denoise(img, 5, 6, 200.0, 30.0, 5, 5)
    out = f.denoise(img, 2.0)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_factored_save_load_roundtrip(tmp_path, image):
    ff = train_filter_factored(image, *ARGS)
    fS = transform_eigenvalues(ff.eigvals, jnp.asarray(W, jnp.float32))
    want = ff.apply(image, fS)
    path = str(tmp_path / "f")        # suffixless
    ff.save(path)
    ff2 = load_filter(path)
    assert isinstance(ff2, FactoredFilter)
    got = ff2.apply(image, fS)
    np.testing.assert_array_equal(got, want)
    # The direct classmethod resolves the same .npz suffix rule.
    ff3 = FactoredFilter.load(path)
    np.testing.assert_array_equal(ff3.apply(image, fS), want)


def test_factored_size_guard(image):
    ff = train_filter_factored(image, *ARGS)
    with pytest.raises(ValueError, match="match"):
        ff.apply(np.zeros((10, 10), np.float32), np.ones(4))


def test_factored_cli_roundtrip(tmp_path, rng):
    """--factored on nle-enhance; nle-apply auto-detects the filter kind."""
    from nle_tpu.cli import apply as apply_cli
    from nle_tpu.cli import enhance as enhance_cli
    from nle_tpu.utils.imageio import imwrite_bgr

    img = rng.integers(0, 256, (24, 30, 3), np.uint8)
    src = str(tmp_path / "in.png")
    imwrite_bgr(src, img)
    fpath = str(tmp_path / "f.npz")
    out1 = str(tmp_path / "o1.png")
    rc = enhance_cli.main([src, out1, "3", "4", "100", "30", "5", "5",
                           "1", "2", "--factored",
                           f"--save-filter={fpath}"])
    assert rc == 0 and os.path.exists(out1)
    out2 = str(tmp_path / "o2.png")
    assert apply_cli.main([fpath, src, out2, "1", "2"]) == 0
    from nle_tpu.utils.imageio import imread_bgr

    np.testing.assert_array_equal(imread_bgr(out2), imread_bgr(out1))


def test_sharded_factored_matches_single_chip():
    """train_filter_sharded(factored=True) on the 8-device CPU mesh returns
    FactoredFilters matching the single-chip factored trainer; the
    pixel-sharded apply matches the filters' own apply."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nle_tpu.parallel.sharded import (
        apply_filter_factored_sharded,
        make_mesh,
        train_filter_sharded,
    )

    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, (2, 40, 52)).astype(np.float32)
    args = (5, 5, 30.0, 10.0, 8, 4)
    mesh = make_mesh(2, 4)
    flts = train_filter_sharded(batch, *args, mesh, streaming=True,
                                factored=True)
    assert len(flts) == 2 and all(f is not None for f in flts)
    w = jnp.asarray(W, jnp.float32)
    for i in range(2):
        ff_1 = train_filter_factored(batch[i], *args)
        fS = transform_eigenvalues(ff_1.eigvals, w)
        out_1 = ff_1.apply(batch[i], fS)
        fS_s = transform_eigenvalues(flts[i].eigvals, w)
        out_s = flts[i].apply(batch[i], fS_s)
        assert np.abs(out_s - out_1).max() < 0.05
        out_ms = apply_filter_factored_sharded(flts[i], batch[i], fS_s,
                                               make_mesh(1, 8))
        assert np.abs(out_ms - out_s).max() < 0.01


def test_sharded_factored_requires_streaming():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nle_tpu.parallel.sharded import make_mesh, train_filter_sharded

    with pytest.raises(ValueError, match="streaming"):
        train_filter_sharded(np.zeros((1, 8, 8), np.float32), 2, 2, 10.0,
                             10.0, 2, 2, make_mesh(1, 8), factored=True)
