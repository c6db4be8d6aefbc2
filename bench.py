"""Benchmark: end-to-end enhance throughput on ~1 MP input (the BASELINE.md
headline metric; target >= 1 MP/s on one v5e chip).

Runs the full enhance pipeline — Lab conversion, filter training (host-f64
stage 1 + device stage 2), eigenvalue transform, apply, Lab round-trip —
on rock2.jpg (the reference's "requires a lot of memory" case,
README.md:82) resized to ~1 MP, with the rock2 golden parameters
(20 30 500 10 50 50). Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def load_input(target_mp=1.0):
    import cv2

    path = "/root/reference/data/rock2.jpg"
    if os.path.exists(path):
        img = cv2.imread(path)
        h, w = img.shape[:2]
        scale = (target_mp * 1e6 / (h * w)) ** 0.5
        img = cv2.resize(img, (int(w * scale), int(h * scale)),
                         interpolation=cv2.INTER_CUBIC)
    else:  # synthetic fallback
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (832, 1216, 3), np.uint8)
    return img


def main():
    target_mp = float(os.environ.get("NLE_BENCH_MP", "1.0"))
    repeats = int(os.environ.get("NLE_BENCH_REPEATS", "8"))

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.models.filter import NLEFilter

    enable_persistent_cache()
    img = load_input(target_mp)
    mp = img.shape[0] * img.shape[1] / 1e6
    params = (20, 30, 500.0, 10.0, 50, 50)
    weights = [4.0, 3.0, 4.0, 1.0]

    def run():
        f = NLEFilter()
        f.train_for_enhancement(img, *params)
        return f.enhance(img, weights)

    run()  # warmup: compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = mp / best
    print(json.dumps({
        "metric": "enhance_throughput_1mp",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(value / 1.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
