"""Cross-implementation denoise parity (VERDICT r2 missing#2).

The reference trains its denoise filter on `cv::bilateralFilter` output
(reference src/filter.cpp:534-535) and writes the bilateral L plane into
the result (src/filter.cpp:366-372). Our bilateral (color/bilateral.py)
matches cv2 to <= 1 LSB but not always bit-exactly: cv2's SIMD kernels
accumulate with FMA, and even an operation-order-exact float32 LUT
re-implementation leaves ~1 mismatch per 50k pixels on rounding ties
(measured; the small-aperture d<=5 path diverges further, but the
reference only ever calls d=-1). These tests therefore pin BOTH halves of
the parity claim:

1. at the reference's default sigmas (10, 10) on the actual denoise input,
   our bilateral IS bit-exact vs cv2 — the shipped-config surface;
2. at sigmas where the two bilaterals differ (1-LSB ties), the FULL
   denoise outputs — one trained/applied with our bilateral, one with
   cv2's exact output substituted at both call sites — agree >= 45 dB,
   quantifying (not assuming) the downstream effect of the residual
   <= 1 LSB difference. Measured headroom: 70-86 dB.
"""

import os

import numpy as np
import pytest

import oracle_numpy as O
from nle_tpu.golden_configs import DATA_DIR

cv2 = pytest.importorskip("cv2")

TAJ = os.path.join(DATA_DIR, "taj-rgb-noise.jpg")
PARAMS = (10, 10, 200, 30, 10, 10)   # the README taj denoise config


@pytest.fixture(scope="module")
def taj_L():
    from nle_tpu.color.lab import bgr_to_lab_u8_np

    img = cv2.imread(TAJ)
    return img, bgr_to_lab_u8_np(img)[..., 0]


def test_bilateral_bit_exact_at_reference_default(taj_L):
    """Default sigmas (reference include/filter.hpp:42-45): bit-exact vs
    cv2.bilateralFilter on the real denoise input's L channel."""
    import jax.numpy as jnp

    from nle_tpu.color.bilateral import bilateral_filter_u8

    _, L = taj_L
    ref = cv2.bilateralFilter(L, -1, 10, 10)
    ours = np.asarray(bilateral_filter_u8(jnp.asarray(L), -1, 10, 10))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("sc,ss", [(8.0, 6.0), (15.0, 6.0)])
def test_denoise_gate_vs_cv2_bilateral_substitution(taj_L, sc, ss):
    """Full denoise with our bilateral vs full denoise with cv2's exact
    bilateral substituted (training prefilter + output L plane) must agree
    >= 45 dB. The sigma pairs are chosen where the two bilaterals DO differ
    on this input (1-2 px by 1 LSB, measured) so the gate is non-vacuous."""
    import jax.numpy as jnp

    from nle_tpu.color.bilateral import bilateral_filter_u8
    from nle_tpu.models.filter import NLEFilter

    img, L = taj_L
    bl_cv = cv2.bilateralFilter(L, -1, sc, ss)
    bl_ours = np.asarray(bilateral_filter_u8(jnp.asarray(L), -1, sc, ss))
    assert int(np.abs(bl_cv.astype(int) - bl_ours.astype(int)).max()) <= 1

    f1 = NLEFilter()
    f1.train_for_denoise(img, *PARAMS, sc, ss)
    out_ours = f1.denoise(img, 2.0, sc, ss)
    f2 = NLEFilter()
    f2.train_for_denoise(img, *PARAMS, sc, ss, bilateral_L=bl_cv)
    out_cv = f2.denoise(img, 2.0, sc, ss, bilateral_L=bl_cv)

    if np.array_equal(bl_cv, bl_ours):
        # Bit-exact bilateral => bit-exact denoise (nothing else differs).
        np.testing.assert_array_equal(out_ours, out_cv)
    else:
        psnr = O.psnr(out_ours, out_cv)
        assert psnr >= 45.0, (
            f"denoise diverges {psnr:.1f} dB from the cv2-bilateral chain "
            f"at sigmas ({sc}, {ss})")
