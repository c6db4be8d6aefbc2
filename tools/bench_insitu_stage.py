"""REAL-stage in-situ Sinkhorn slope: time the full single-image train
(NLEFilter.train_for_enhancement, bench params) at two Sinkhorn iteration
counts and report the marginal ms per halfstep. Every non-Sinkhorn cost
(stage 1 eigh, host chain, transfers, phi build, gram) is identical at
both K, so the slope isolates the in-situ halfstep cost through the REAL
train_filter_stage2a — the thing the stripped harness (bench_sk_insitu.py)
approximates.

Carrier selection is by NLE_SINKHORN_INT16 (trace-time env): run once per
carrier in FRESH processes. The earlier falsification ("both carriers at
the f32 wall in situ") disagrees with the stripped harness (packed s32
1.73 vs f32 3.39 ms/halfstep at the same shape); this tool re-measures the
claim at HEAD with a clean method.

Usage: cd /root/repo && python tools/bench_insitu_stage.py [--k1=10 --k2=50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=50)
    ap.add_argument("--mp", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from bench_input import load_input

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.models.filter import NLEFilter

    enable_persistent_cache()
    img = load_input(args.mp)
    carrier = os.environ.get("NLE_SINKHORN_INT16", "auto")

    walls = {}
    for K in (args.k1, args.k2):
        NLEFilter().train_for_enhancement(img, 20, 30, 500.0, 10.0, K, 50)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            NLEFilter().train_for_enhancement(
                img, 20, 30, 500.0, 10.0, K, 50)
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
        print(json.dumps({"carrier": carrier, "K": K,
                          "wall_s": round(best, 4)}), flush=True)
    slope = (walls[args.k2] - walls[args.k1]) / (
        2 * (args.k2 - args.k1)) * 1e3
    print(json.dumps({"carrier": carrier, "ms_per_halfstep": round(slope, 3),
                      "wall_k1_s": round(walls[args.k1], 4),
                      "wall_k2_s": round(walls[args.k2], 4)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
