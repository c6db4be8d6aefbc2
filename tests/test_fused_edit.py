"""The fused train->edit apply (train_filter_stage2b_edit /
NLEFilter.train_and_enhance) must reproduce the two-call sequence: same
f(S) transform, same apply algebra — only the program boundary moves, so
results may differ by XLA contraction association (<= 1 u8 LSB on a
vanishing fraction of pixels)."""

import numpy as np
import pytest

from nle_tpu.models.filter import NLEFilter


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)


PARAMS = (5, 5, 30.0, 10.0, 10, 5)
WEIGHTS = [4.0, 3.0, 2.0, 1.0, 1.1]


def _assert_u8_close(a, b, frac=0.001):
    a = np.asarray(a, np.int32)
    b = np.asarray(b, np.int32)
    d = np.abs(a - b)
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() <= frac, (d != 0).mean()


def test_fused_matches_two_call_dense(image):
    two = NLEFilter()
    two.train_for_enhancement(image, *PARAMS)
    expected = two.enhance(image, WEIGHTS)

    flt = NLEFilter()
    got = flt.train_and_enhance(image, *PARAMS, WEIGHTS)
    _assert_u8_close(got, expected)

    # The filter state is left trained: a follow-up standalone edit works
    # and agrees with the fused result.
    again = flt.enhance(image, WEIGHTS)
    _assert_u8_close(again, got)
    # And with the reference filter's own state.
    np.testing.assert_allclose(
        np.asarray(flt.trained.eigvals), np.asarray(two.trained.eigvals),
        rtol=1e-6)


def test_fused_matches_two_call_streaming(image):
    two = NLEFilter(streaming=True)
    two.train_for_enhancement(image, *PARAMS)
    expected = two.enhance(image, WEIGHTS)

    got = NLEFilter(streaming=True).train_and_enhance(image, *PARAMS, WEIGHTS)
    _assert_u8_close(got, expected)


def test_fused_factored_fallback(image):
    two = NLEFilter(factored=True)
    two.train_for_enhancement(image, *PARAMS)
    expected = two.enhance(image, WEIGHTS)

    got = NLEFilter(factored=True).train_and_enhance(image, *PARAMS, WEIGHTS)
    np.testing.assert_array_equal(got, expected)


def test_fused_f64_path(image):
    """The non-split f64 pipeline has no stage 2b — edit_weights falls back
    to a standalone apply inside train_filter."""
    two = NLEFilter(dtype=np.float64)
    two.train_for_enhancement(image, *PARAMS)
    expected = two.enhance(image, WEIGHTS)

    got = NLEFilter(dtype=np.float64).train_and_enhance(
        image, *PARAMS, WEIGHTS)
    _assert_u8_close(got, expected)


def test_fused_rejects_non_rgb(image):
    with pytest.raises(ValueError, match="RGB"):
        NLEFilter().train_and_enhance(image[..., 0], *PARAMS, WEIGHTS)


def test_train_filter_edit_weights_requires_packed_order(image):
    from nle_tpu.ops.pipeline import train_filter

    L = image[..., 0].astype(np.float32)
    with pytest.raises(ValueError, match="pixel_order"):
        train_filter(L, 5, 5, 30.0, 10.0, 10, 5, edit_weights=WEIGHTS)
