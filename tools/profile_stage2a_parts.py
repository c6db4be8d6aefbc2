"""Device-side component breakdown of the dense fused stage 2a at the
serving shape: times each N-scale piece as its own jitted program (same
inputs, best-of-N with forcing fetches) so stream-roofline work targets
measured milliseconds, not arithmetic (ROADMAP 15/22; VERDICT r3 #3).

Pieces:
  affinity   phi_b = K_AB @ Uinv (fused Pallas build)
  assemble   zeros (npad, mpad) + DUS(Um) + DUS(phi_b)
  s0_dot     phi^T @ ones as the old 6-pass GEMV
  prep_fused column sum + abs-max + quantize + pair-pack (the int16 prep)
  halfstep   one packed-int16 fused halfstep (the loop body)
  halfstep32 one f32 fused halfstep (the =off loop body)
  cphi_gram  cphi = c*phi materialization + 3-pass split gram (small path)
  gram_fused scaled_gram_pallas on the unscaled phi (non-small path)
  stage2b    cphi @ grt tail + Va overlay + fused u8 edit
  full2a     the real train_filter_stage2a program, end to end

Run from /root/repo (axon cwd rule), ONE TPU job at a time:
    python tools/profile_stage2a_parts.py [--mp=1.0] [--repeats=5]
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
    ap.add_argument("--mp", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from bench_input import load_input

    from nle_tpu.color.lab import bgr_to_lab_u8_np
    from nle_tpu.ops.affinity import affinity_matmul, bandwidth_weights, features
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        _packed_chunk,
        padded_shape,
        quantize_pack_int16,
        sinkhorn_halfstep_manual,
        split_row_pad,
    )
    from nle_tpu.ops.pipeline import (
        _grid_device_arrays,
        bucket_m,
        ka_eigh_host64,
        pack_channel,
        pack_stage1,
        train_filter_stage2a,
        stage2_dense_small,
    )
    from nle_tpu.ops.sampling import sample_grid

    nr, nc, hx, hy, iters, k = 20, 30, 500.0, 10.0, 50, 50
    img = load_input(args.mp)
    chan = bgr_to_lab_u8_np(img)[..., 0].astype(np.float32)
    H, W = chan.shape
    grid = sample_grid(H, W, nr, nc)
    p = grid.n_samples
    n = grid.n_pixels
    eps = 1e-10
    Um64, lam64, Uinv64 = ka_eigh_host64(
        chan[grid.sel_rows, grid.sel_cols].astype(np.float64),
        grid.sel_rows, grid.sel_cols, hx, hy, eps)
    m = lam64.shape[0]
    mb = bucket_m(m, p)
    npad, mpad = padded_shape(n, mb)
    print(json.dumps({"n": n, "p": p, "m": m, "mb": mb,
                      "npad": npad, "mpad": mpad,
                      "small": stage2_dense_small(n, mb),
                      "backend": jax.default_backend()}), flush=True)

    packed_np, _ = pack_channel(chan, grid.perm)
    y = jnp.asarray(packed_np).astype(jnp.float32)
    perm, rr, cc = _grid_device_arrays(grid, jnp.float32)
    sw, pw = bandwidth_weights(hx, hy, jnp.float32)
    s1 = jnp.asarray(pack_stage1(Um64, lam64, mb=mb))

    def timeit(name, fn, *a):
        fn(*a)  # compile + warm
        walls = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*a)
            # Force completion with a scalar fetch (axon block_until_ready
            # can return early).
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(leaf.ravel()[0]))
            walls.append(time.perf_counter() - t0)
        print(json.dumps({"part": name, "ms": round(min(walls) * 1e3, 2)}),
              flush=True)
        return out

    with jax.default_matmul_precision("highest"):
        from nle_tpu.ops.pipeline import _unpack_stage1

        @jax.jit
        def build_affinity(y, s1):
            Um, lam_m, Uinv, m_dyn = _unpack_stage1(s1, p)
            f = features(rr, cc, y)
            return affinity_matmul(f[:p], f[p:], Uinv, sw, pw)

        phi_b = timeit("affinity", build_affinity, y, s1)

        @jax.jit
        def assemble(phi_b, s1):
            Um = _unpack_stage1(s1, p)[0]
            phi = jnp.zeros((npad, mpad), jnp.float32)
            phi = jax.lax.dynamic_update_slice(phi, Um, (0, 0))
            return jax.lax.dynamic_update_slice(phi, phi_b, (p, 0))

        phi = timeit("assemble", assemble, phi_b, s1)

        @jax.jit
        def s0_dot(phi):
            return phi.T @ jnp.ones((npad,), jnp.float32)

        timeit("s0_dot", s0_dot, phi)

        @jax.jit
        def prep_fused(phi):
            s0 = jnp.sum(phi, axis=0)
            q32, scale, colmax = quantize_pack_int16(phi)
            return q32, scale, colmax, s0

        q32, scale, colmax, s0 = timeit("prep_fused", prep_fused, phi)

        # tile depends only on mb; split_row_pad owns the VMEM shrink rule.
        tile = split_row_pad(1, mb)[1]
        chunk_q = _packed_chunk(tile, npad // 2, mpad)
        t_vec = jnp.asarray(
            np.random.default_rng(0).random(mpad), jnp.float32)

        interp = jax.default_backend() == "cpu"

        def halfstep(q32, t):
            return sinkhorn_halfstep_manual(q32, t, eps, chunk=chunk_q,
                                            interpret=interp)

        timeit("halfstep", halfstep, q32, t_vec)

        def halfstep32(phi, t):
            return sinkhorn_halfstep_manual(phi, t, eps, chunk=tile,
                                            interpret=interp)

        timeit("halfstep32", halfstep32, phi, t_vec)

        c_rest = jnp.asarray(
            np.random.default_rng(1).random((npad, 1)), jnp.float32)

        @jax.jit
        def cphi_gram(phi, c_rest):
            from nle_tpu.ops.precision import stage2_gram

            cphi = c_rest * phi
            return stage2_gram(cphi), cphi

        _, cphi = timeit("cphi_gram", cphi_gram, phi, c_rest)

        from nle_tpu.ops.pallas.scaled_matmul_kernel import (
            scaled_fits_vmem,
            scaled_gram_pallas,
        )

        if scaled_fits_vmem(mpad):
            @jax.jit
            def gram_fused(phi, c_rest):
                return scaled_gram_pallas(phi, c_rest, interpret=interp)

            timeit("gram_fused", gram_fused, phi, c_rest)

        va_grt = jnp.asarray(
            np.random.default_rng(2).standard_normal((mb, 2 * k)),
            jnp.float32)
        fs = jnp.asarray(np.random.default_rng(3).random(k), jnp.float32)
        from nle_tpu.ops.pipeline import train_filter_stage2b_edit

        def stage2b(cphi, c_rest, va_grt, y, fs):
            return train_filter_stage2b_edit(
                cphi, c_rest, va_grt, y, fs, n=n, mb=mb, scaled=True,
                interpret=interp)

        timeit("stage2b_edit", stage2b, cphi, c_rest, va_grt, y, fs)

    def full2a(y, s1):
        return train_filter_stage2a(
            y, rr, cc, s1, sw, pw, p=p, mb=mb, n_sinkhorn_iter=iters,
            eps=eps, small=stage2_dense_small(n, mb),
            interpret=jax.default_backend() == "cpu")

    timeit("full2a", full2a, y, s1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
