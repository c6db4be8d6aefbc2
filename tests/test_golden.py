"""Golden-image regression against the reference's shipped outputs
(BASELINE.md; reference README.md:72-84).

The default run checks the smallest config; NLE_RUN_FULL_GOLDEN=1 enforces
the FULL invariant — all 10 README enhance configs >= 45 dB PLUS the
end-to-end denoise gate (several minutes on CPU). Config table is shared
with tools/golden_sweep.py via nle_tpu.golden_configs so the gate and the
committed snapshot (GOLDEN_TPU.jsonl) cannot drift.
"""

import os

import pytest

import oracle_numpy as O
from nle_tpu.golden_configs import (
    DATA_DIR,
    DENOISE_CONFIG,
    DENOISE_GOLDEN,
    ENHANCE_CONFIGS,
    EXTENDED_RECIPES,
)

cv2 = pytest.importorskip("cv2")

FULL = os.environ.get("NLE_RUN_FULL_GOLDEN") == "1"
EXTENDED = os.environ.get("NLE_RUN_EXTENDED_GOLDEN") == "1"

# Default (fast) mode: the smallest config only. FULL: the whole table.
_SELECTED = ENHANCE_CONFIGS if FULL else [ENHANCE_CONFIGS[0]]


@pytest.mark.parametrize(
    "inp,goldf,params,weights",
    [(c[1], c[2], c[3], c[4]) for c in _SELECTED],
    ids=[c[0] for c in _SELECTED],
)
def test_golden_psnr_gate(inp, goldf, params, weights):
    from nle_tpu.models.filter import NLEFilter

    img = cv2.imread(os.path.join(DATA_DIR, inp))
    gold = cv2.imread(os.path.join(DATA_DIR, goldf))
    f = NLEFilter()
    f.train_for_enhancement(img, *params)
    out = f.enhance(img, weights)
    psnr = O.psnr(out, gold)
    assert psnr >= 45.0, f"{inp}: {psnr:.2f} dB < 45 dB gate"


@pytest.mark.skipif(not FULL, reason="NLE_RUN_FULL_GOLDEN=1 only")
def test_golden_denoise_gate():
    """End-to-end denoise vs our own f64 golden (the reference ships no
    denoised output — reference README.md:27)."""
    from nle_tpu.golden_configs import generate_denoise_golden
    from nle_tpu.models.filter import NLEFilter

    _, inp, params, dparams = DENOISE_CONFIG
    generate_denoise_golden()
    img = cv2.imread(os.path.join(DATA_DIR, inp))
    gold = cv2.imread(DENOISE_GOLDEN)
    sigma_color, sigma_space, shrink = dparams
    f = NLEFilter()
    f.train_for_denoise(img, *params, sigma_color, sigma_space)
    out = f.denoise(img, shrink, sigma_color, sigma_space)
    psnr = O.psnr(out, gold)
    assert psnr >= 45.0, f"{inp} denoise: {psnr:.2f} dB < 45 dB gate"


@pytest.mark.skipif(not EXTENDED, reason="NLE_RUN_EXTENDED_GOLDEN=1 only")
@pytest.mark.parametrize(
    "inp,params,weights",
    [(c[1], c[2], c[3]) for c in EXTENDED_RECIPES],
    ids=[c[0] for c in EXTENDED_RECIPES],
)
def test_extended_recipe_selfconsistency(inp, params, weights):
    """links.md historical recipes (no shipped goldens): the f32 pipeline
    must agree with the f64 oracle pipeline on the final u8 image."""
    import numpy as np

    from nle_tpu.models.filter import NLEFilter

    img = cv2.imread(os.path.join(DATA_DIR, inp))
    f = NLEFilter()
    f.train_for_enhancement(img, *params)
    out = f.enhance(img, weights)
    ref = O.enhance_image(img, *params, weights)
    psnr = O.psnr(out, ref)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert psnr >= 45.0, f"{inp}: f32-vs-f64 {psnr:.2f} dB < 45 dB"
