"""Run the README golden configuration suite and report PSNR vs the
reference's shipped outputs (BASELINE.md table). Usage:

    python tools/golden_sweep.py [--platform=cpu|axon] [--precision=float64]
        [--configs=flower,bird,...] [--repeat-timing]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # name, input, golden, (nr, nc, hx, hy, iters, k), weights
    ("flower", "flower-50.bmp", "flower-filtered.png", (10, 20, 100, 30, 50, 30), [2, 3, 4, 1]),
    ("bird", "bird.bmp", "bird-filtered.png", (10, 20, 1000, 20, 10, 10), [1, 5, 5, 1]),
    ("canyon", "canyon-dawn-20.bmp", "canyon-filtered.bmp", (20, 10, 500, 30, 40, 10), [2, 7, 5, 1]),
    ("brickwall", "brickwall-20.bmp", "brickwall-filtered.png", (10, 20, 1000, 25, 30, 50), [2, 3, 3, 1]),
    ("conifer", "conifer-10.bmp", "conifer-filtered.png", (25, 15, 800, 20, 40, 100), [2, 3, 5, 1]),
    ("forest", "forest-10.bmp", "forest-filtered.png", (20, 10, 5000, 30, 10, 10), [4, 6, 6, 1.05]),
    ("snow-mountain", "snow-mountain-15.bmp", "snow-mountain-filtered.png", (10, 20, 200, 30, 30, 10), [3, 10, 1, 1]),
    ("paper", "paper.jpg", "paper-filtered.png", (20, 20, 1000, 40, 50, 20), [0.5, 1, 5, 1]),
    ("rock2", "rock2.jpg", "rock2-filtered.png", (20, 30, 500, 10, 50, 50), [4, 3, 4, 1]),
    ("red-cherries", "red-cherries-10.bmp", "red-cherries-filtered.png", (20, 10, 400, 30, 50, 20), [2, 2, 2, 1]),
]

DATA = "/root/reference/data"


def main():
    platform = "cpu"
    precision = "float32"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        elif a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        elif a.startswith("--configs="):
            only = set(a.split("=", 1)[1].split(","))

    import jax

    jax.config.update("jax_platforms", platform)
    if precision == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import oracle_numpy as O
    from nle_tpu.models.filter import NLEFilter

    dtype = jnp.float64 if precision == "float64" else jnp.float32
    import cv2

    results = []
    for name, inp, goldf, params, weights in CONFIGS:
        if only and name not in only:
            continue
        img = cv2.imread(os.path.join(DATA, inp))
        gold = cv2.imread(os.path.join(DATA, goldf))
        nr, nc, hx, hy, iters, k = params
        t0 = time.time()
        f = NLEFilter(dtype=dtype)
        f.train_for_enhancement(img, nr, nc, hx, hy, iters, k)
        out = f.enhance(img, weights)
        dt = time.time() - t0
        ps = O.psnr(out, gold)
        mp = img.shape[0] * img.shape[1] / 1e6
        row = dict(name=name, psnr=round(float(ps), 2), sec=round(dt, 2),
                   mpix=round(mp, 3), mp_per_s=round(mp / dt, 3))
        results.append(row)
        print(json.dumps(row), flush=True)

    if results:
        worst = min(r["psnr"] for r in results)
        print(json.dumps(dict(summary=True, worst_psnr=worst,
                              mean_psnr=round(sum(r["psnr"] for r in results) / len(results), 2))),
              flush=True)


if __name__ == "__main__":
    main()
