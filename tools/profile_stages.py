"""Per-stage wall-clock breakdown of the enhance pipeline on the current
backend. Usage: python tools/profile_stages.py [--platform=cpu] [--mp=1.0]
[--config=nr,nc,hx,hy,iters,k]"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    platform = None
    mp = 1.0
    cfg = (20, 30, 500.0, 10.0, 50, 50)
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        elif a.startswith("--mp="):
            mp = float(a.split("=", 1)[1])
        elif a.startswith("--config="):
            cfg = tuple(float(x) for x in a.split("=", 1)[1].split(","))
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_input import load_input  # noqa

    from nle_tpu.color.lab import bgr_to_lab_u8, lab_to_bgr_u8
    from nle_tpu.ops.affinity import bandwidth_weights
    from nle_tpu.ops.pipeline import (
        apply_filter,
        host_chain64,
        ka_eigh_host64,
        train_filter_stage2a,
        train_filter_stage2b,
    )
    from nle_tpu.ops.sampling import sample_grid
    from nle_tpu.ops.transform import transform_eigenvalues

    img = load_input(mp)
    nr, nc, hx, hy, iters, k = int(cfg[0]), int(cfg[1]), cfg[2], cfg[3], int(cfg[4]), int(cfg[5])
    weights = [4.0, 3.0, 4.0, 1.0]
    H, W = img.shape[:2]
    print(f"image {W}x{H} = {H*W/1e6:.3f} MP, config {cfg}")

    def run_once(collect):
        t = {}
        def tick(name, t0):
            t[name] = t.get(name, 0.0) + (time.perf_counter() - t0)

        t0 = time.perf_counter()
        lab = bgr_to_lab_u8(jnp.asarray(img))
        jax.block_until_ready(lab)
        tick("color_fwd", t0)

        t0 = time.perf_counter()
        L = lab[..., 0].astype(jnp.float32)
        grid = sample_grid(H, W, nr, nc)
        p = grid.n_samples
        perm = jnp.asarray(grid.perm)
        flat = L.reshape(-1)
        y = flat[perm]
        rr = (perm % 1).astype(jnp.float32)  # placeholder replaced below
        rr = (perm // W).astype(jnp.float32)
        cc = (perm % W).astype(jnp.float32)
        jax.block_until_ready(y)
        tick("pack", t0)

        t0 = time.perf_counter()
        Lh = np.asarray(L, np.float64)
        Um64, lam64, Uinv64 = ka_eigh_host64(
            Lh[grid.sel_rows, grid.sel_cols], grid.sel_rows, grid.sel_cols,
            hx, hy, 1e-10)
        m = lam64.shape[0]
        tick("stage1_host", t0)

        t0 = time.perf_counter()
        sw, pw = bandwidth_weights(hx, hy)
        Um = jnp.asarray(Um64, jnp.float32)
        lam_m = jnp.asarray(lam64, jnp.float32)
        Uinv = jnp.asarray(Uinv64, jnp.float32)
        packed, cphi = train_filter_stage2a(
            y, rr, cc, Um, lam_m, Uinv, sw, pw,
            p=p, m=m, n_sinkhorn_iter=iters, eps=1e-10)
        jax.block_until_ready(packed)
        tick("stage2a_device", t0)

        t0 = time.perf_counter()
        arr = np.asarray(packed)
        Wa, RGa, Ga = arr[:m], arr[m:2*m], arr[2*m:3*m]
        rt, Sb = arr[3*m], arr[3*m+1:]
        kk = min(k, m)
        Va, GrT, Sq = host_chain64(Wa, RGa, Sb, Ga, rt, kk, 1e-10)
        tick("chain_host", t0)

        t0 = time.perf_counter()
        va_grt = jnp.asarray(np.concatenate([Va, GrT], axis=1), jnp.float32)
        V = train_filter_stage2b(cphi, va_grt, perm)
        jax.block_until_ready(V)
        tick("stage2b+scatter", t0)

        t0 = time.perf_counter()
        S = jnp.asarray(Sq, jnp.float32)
        fS = transform_eigenvalues(S, jnp.asarray(weights, jnp.float32))
        Lf = apply_filter(V, fS, L)
        jax.block_until_ready(Lf)
        tick("apply", t0)

        t0 = time.perf_counter()
        Lf8 = jnp.clip(jnp.rint(Lf), 0, 255).astype(jnp.uint8)
        outl = lab.at[..., 0].set(Lf8)
        bgr = lab_to_bgr_u8(outl)
        out = np.asarray(bgr)
        tick("color_inv+fetch", t0)
        if collect:
            for k2, v in t.items():
                print(f"  {k2:18s} {v*1000:9.1f} ms")
            total = sum(t.values())
            print(f"  {'TOTAL':18s} {total*1000:9.1f} ms  -> {H*W/1e6/total:.3f} MP/s")
        return out

    run_once(collect=False)  # compile warmup
    for _ in range(2):
        print("run:")
        run_once(collect=True)


if __name__ == "__main__":
    main()
