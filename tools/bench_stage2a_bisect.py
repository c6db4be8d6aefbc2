"""Bisect WHICH piece of train_filter_stage2a slows the (HLO-identical)
Sinkhorn while loop. Facts so far (real chip, 1 MP p=600 shape):

  - verbatim sinkhorn_vectors_fused, entry phi:    1.70 ms/halfstep (int16)
  - real train_filter_stage2a:                     4.02 (int16) / 4.04 (f32)
  - the two programs' while BODIES are identical HLO (dump_* tools)

Variants (each a jitted clone of stage2a's fused-small branch with one
piece removed; slope K1->K2 per halfstep):
  full        — the branch verbatim (sanity: should match ~4.0)
  nogram      — rc output only: no c_rest/cphi/gram/outputs after the loop
  entryphi    — phi passed as an entry param (no affinity build / DUS),
                everything after identical to full
  nocphiout   — gram computed, but cphi not returned (no 2.56 GB output)

Usage: cd /root/repo && NLE_SINKHORN_INT16=on python tools/bench_stage2a_bisect.py
"""

import argparse
import functools
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
    ap.add_argument("--only", default=os.environ.get("NLE_BISECT_ONLY", ""))
    args = ap.parse_args()

    from bench_input import load_input

    import jax
    import jax.numpy as jnp

    from nle_tpu.color.lab import bgr_to_lab_u8_np
    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.ops.affinity import affinity_matmul
    from nle_tpu.ops.pipeline import (
        _cast_channel, _grid_device_arrays, _unpack_stage1,
        bandwidth_weights, bucket_m, features, ka_eigh_host64, pack_channel,
        pack_stage1)
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        padded_shape, sinkhorn_vectors_fused)
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
    n = grid.n_pixels
    npad, mpad = padded_shape(n, mb)

    def build_phi(y, rows, cols, stage1_packed):
        Um, lam_m, Uinv, m_dyn = _unpack_stage1(stage1_packed, p)
        f = features(rows, cols, y)
        fa, fb = f[:p], f[p:]
        phi_b = affinity_matmul(fa, fb, Uinv, sw, pw, use_pallas=True)
        phi = jnp.zeros((npad, mpad), jnp.float32)
        phi = jax.lax.dynamic_update_slice(phi, Um, (0, 0))
        phi = jax.lax.dynamic_update_slice(phi, phi_b, (p, 0))
        return phi, lam_m, m_dyn

    @functools.partial(jax.jit, static_argnames=("K",))
    def v_full(y, rr, cc, s1, K):
        with jax.default_matmul_precision("highest"):
            phi, lam_m, m_dyn = build_phi(y, rr, cc, s1)
            r, c = sinkhorn_vectors_fused(phi, lam_m, K, eps, n=n)
            c_rest = jnp.where(jnp.arange(npad) >= m_dyn,
                               jnp.pad(c, (0, npad - n)), 0.0)[:, None]
            cphi = c_rest * phi
            Sb = cphi.T @ cphi
            rc = jnp.stack([r[:mb], c[:mb]])
            return rc, Sb[:mb, :mb], cphi, c_rest

    @functools.partial(jax.jit, static_argnames=("K",))
    def v_nogram(y, rr, cc, s1, K):
        with jax.default_matmul_precision("highest"):
            phi, lam_m, m_dyn = build_phi(y, rr, cc, s1)
            r, c = sinkhorn_vectors_fused(phi, lam_m, K, eps, n=n)
            return jnp.stack([r[:mb], c[:mb]])

    @functools.partial(jax.jit, static_argnames=("K",))
    def v_entryphi(phi, lam_m, m_dyn, K):
        with jax.default_matmul_precision("highest"):
            r, c = sinkhorn_vectors_fused(phi, lam_m, K, eps, n=n)
            c_rest = jnp.where(jnp.arange(npad) >= m_dyn,
                               jnp.pad(c, (0, npad - n)), 0.0)[:, None]
            cphi = c_rest * phi
            Sb = cphi.T @ cphi
            rc = jnp.stack([r[:mb], c[:mb]])
            return rc, Sb[:mb, :mb], cphi, c_rest

    @functools.partial(jax.jit, static_argnames=("K",))
    def v_nocphiout(y, rr, cc, s1, K):
        with jax.default_matmul_precision("highest"):
            phi, lam_m, m_dyn = build_phi(y, rr, cc, s1)
            r, c = sinkhorn_vectors_fused(phi, lam_m, K, eps, n=n)
            c_rest = jnp.where(jnp.arange(npad) >= m_dyn,
                               jnp.pad(c, (0, npad - n)), 0.0)[:, None]
            cphi = c_rest * phi
            Sb = cphi.T @ cphi
            rc = jnp.stack([r[:mb], c[:mb]])
            return rc, Sb[:mb, :mb]

    # entry-phi operands (built once, on device, NOT timed)
    phi_e, lam_e, mdyn_e = jax.jit(build_phi)(y, rr, cc, stage1_dev)
    phi_e.block_until_ready()

    variants = {
        "full": lambda K: v_full(y, rr, cc, stage1_dev, K=K),
        "nogram": lambda K: v_nogram(y, rr, cc, stage1_dev, K=K),
        "entryphi": lambda K: v_entryphi(phi_e, lam_e, mdyn_e, K=K),
        "nocphiout": lambda K: v_nocphiout(y, rr, cc, stage1_dev, K=K),
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    carrier = os.environ.get("NLE_SINKHORN_INT16", "auto")
    for name, fn in variants.items():
        walls = {}
        for K in (args.k1, args.k2):
            out = fn(K)
            first = out[0] if isinstance(out, tuple) else out
            float(first[0, 0])  # warm + force
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out = fn(K)
                first = out[0] if isinstance(out, tuple) else out
                float(first[0, 0])
                best = min(best, time.perf_counter() - t0)
            walls[K] = best
        slope = (walls[args.k2] - walls[args.k1]) / (
            2 * (args.k2 - args.k1)) * 1e3
        print(json.dumps({"variant": name, "carrier": carrier,
                          "ms_per_halfstep": round(slope, 3),
                          "wall_k1_s": round(walls[args.k1], 4),
                          "wall_k2_s": round(walls[args.k2], 4)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
