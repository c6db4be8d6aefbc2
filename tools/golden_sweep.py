"""Run the README golden configuration suite and report PSNR vs the
reference's shipped outputs (BASELINE.md table). Usage:

    python tools/golden_sweep.py [--platform=cpu|axon] [--precision=float64]
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

# Denoise end-to-end regression: the reference ships no denoised golden
# output (README.md:27 "result ... is not good"), so the golden is OUR OWN
# float64 CPU pipeline (which matches the fp64 oracle to 1e-15) — the gate
# checks the f32/TPU path against it. Params from the reference denoise CLI
# contract: nr nc hx hy iters k sigmaColor sigmaSpace shrink.
DENOISE_CONFIG = ("taj-denoise", "taj-rgb-noise.jpg",
                  (10, 10, 200, 30, 10, 10), (10, 10, 2.0))
DENOISE_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_cache",
                              "taj-denoise-f64.png")

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
    if "--denoise-golden-only" in sys.argv:
        only = {"taj-denoise"}

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

    name, inp, params, dparams = DENOISE_CONFIG
    if not only or name in only:
        img = cv2.imread(os.path.join(DATA, inp))
        nr, nc, hx, hy, iters, k = params
        sigma_color, sigma_space, shrink = dparams
        golden_only = "--denoise-golden-only" in sys.argv
        if not golden_only and not os.path.exists(DENOISE_GOLDEN):
            # Generate the f64 golden once (requires a fresh x64 process).
            import subprocess

            print(json.dumps(dict(note=f"generating {DENOISE_GOLDEN}")),
                  flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--platform=cpu", "--precision=float64",
                 "--denoise-golden-only"],
                check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        t0 = time.time()
        f = NLEFilter(dtype=dtype)
        f.train_for_denoise(img, nr, nc, hx, hy, iters, k,
                            sigma_color, sigma_space)
        out = f.denoise(img, shrink, sigma_color, sigma_space)
        dt = time.time() - t0
        if "--denoise-golden-only" in sys.argv:
            os.makedirs(os.path.dirname(DENOISE_GOLDEN), exist_ok=True)
            cv2.imwrite(DENOISE_GOLDEN, out)
            print(json.dumps(dict(note=f"wrote {DENOISE_GOLDEN}")), flush=True)
            return
        gold = cv2.imread(DENOISE_GOLDEN)
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
