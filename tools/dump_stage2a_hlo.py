"""Dump the optimized HLO of the REAL train_filter_stage2a at the 1 MP
bench shape, filtered to the Sinkhorn while-loop region — the evidence
layer for the in-situ carrier slope (bench_insitu_stage.py): the packed
s32 carrier is 2x faster than f32 in the stripped harness yet SLOWER in
situ (4.28 vs 3.62 ms/halfstep), so whatever spoils it must be visible
here (copies, relayouts, rematerialized quantization, fusion shapes).

Carrier via NLE_SINKHORN_INT16 (trace-time). Usage:
    cd /root/repo && NLE_SINKHORN_INT16=on python tools/dump_stage2a_hlo.py
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--mp", type=float, default=1.0)
    ap.add_argument("--pattern", default=r"custom-call|copy|transpose|while|"
                    r"s32|bitcast|fusion|convert")
    ap.add_argument("--all", action="store_true", help="print full HLO")
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
    lowered = train_filter_stage2a.lower(
        y, rr, cc, stage1_dev, sw, pw, p=p, mb=mb,
        n_sinkhorn_iter=args.iters, eps=eps,
        small=stage2_dense_small(grid.n_pixels, mb))
    txt = lowered.compile().as_text()
    if args.all:
        print(txt)
        return 0
    pat = re.compile(args.pattern)
    for ln in txt.splitlines():
        if pat.search(ln):
            print(ln[:300])
    return 0


if __name__ == "__main__":
    sys.exit(main())
