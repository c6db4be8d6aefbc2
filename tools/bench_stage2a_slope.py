"""Slope-time the REAL train_filter_stage2a jit in isolation (no host
chain, no stage 2b, no fetches beyond a forcing scalar): the bisection
layer between bench_sk_insitu.py (stripped loop + verbatim
sinkhorn_vectors_fused — packed carrier FAST, 1.7 ms/halfstep) and
bench_insitu_stage.py (full train — packed carrier SLOW, 4.28). If this
reproduces the slow slope, the spoiler is in the stage2a program around
the Sinkhorn loop; if it is fast, the spoiler is in the train-flow
dispatch pattern (fetch interleaving etc.).

Carrier via NLE_SINKHORN_INT16. Usage:
    cd /root/repo && NLE_SINKHORN_INT16=on python tools/bench_stage2a_slope.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

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

    import jax.numpy as jnp

    from nle_tpu.color.lab import bgr_to_lab_u8_np
    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.ops.pipeline import (
        _cast_channel, _grid_device_arrays, bandwidth_weights, bucket_m,
        ka_eigh_host64, pack_channel, pack_stage1, stage2_dense_small,
        train_filter_stage2a)
    from nle_tpu.ops.sampling import sample_grid

    enable_persistent_cache()
    img = load_input(args.mp)
    L = bgr_to_lab_u8_np(img)[..., 0].astype(np.float32)
    nrows, ncols = L.shape
    hx, hy, eps = 500.0, 10.0, 1e-10
    grid = sample_grid(nrows, ncols, 20, 30)
    p = grid.n_samples
    perm, rr, cc = _grid_device_arrays(grid, jnp.float32)
    packed_np, _ = pack_channel(L, grid.perm)
    y = _cast_channel(jnp.asarray(packed_np), jnp.float32)
    sw, pw = bandwidth_weights(hx, hy, jnp.float32)
    Um64, lam64, _ = ka_eigh_host64(
        L[grid.sel_rows, grid.sel_cols].astype(np.float64),
        grid.sel_rows, grid.sel_cols, hx, hy, eps)
    m = lam64.shape[0]
    mb = bucket_m(m, p)
    stage1_dev = jnp.asarray(pack_stage1(Um64, lam64, np.dtype(np.float32),
                                         mb=mb))
    small = stage2_dense_small(grid.n_pixels, mb)
    carrier = os.environ.get("NLE_SINKHORN_INT16", "auto")

    def run(K):
        rc, Sb, factor, c_rest = train_filter_stage2a(
            y, rr, cc, stage1_dev, sw, pw, p=p, mb=mb,
            n_sinkhorn_iter=K, eps=eps, small=small)
        # Scalar fetch forces execution through the axon tunnel
        # (block_until_ready may return early there, CLAUDE.md).
        return float(rc[0, 0])

    walls = {}
    for K in (args.k1, args.k2):
        run(K)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run(K)
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
