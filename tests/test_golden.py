"""Golden-image regression against the reference's shipped outputs
(BASELINE.md; reference README.md:72-84). The default run checks the
smallest config; set NLE_RUN_FULL_GOLDEN=1 for the whole suite (minutes)."""

import os

import numpy as np
import pytest

import oracle_numpy as O
from conftest import DATA_DIR

cv2 = pytest.importorskip("cv2")

CONFIGS = [
    ("flower-50.bmp", "flower-filtered.png", (10, 20, 100, 30, 50, 30), [2, 3, 4, 1]),
    ("bird.bmp", "bird-filtered.png", (10, 20, 1000, 20, 10, 10), [1, 5, 5, 1]),
    ("forest-10.bmp", "forest-filtered.png", (20, 10, 5000, 30, 10, 10), [4, 6, 6, 1.05]),
]

FULL = os.environ.get("NLE_RUN_FULL_GOLDEN") == "1"


@pytest.mark.parametrize(
    "inp,goldf,params,weights", CONFIGS if FULL else CONFIGS[:1]
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
