"""Large-image capacity benchmark: trains + applies the enhance filter on a
synthetic multi-megapixel image through the phi-free streaming stage 2
(ops/pallas/streaming_kernel.py). At m ~ 600 the dense path's phi (N, m)
exceeds v5e HBM beyond ~5 MP; the streaming path is O(N) memory.

Usage: python tools/bench_capacity.py [--mp=8] [--platform=cpu]
First compile of a new shape takes minutes on the tunnel-attached TPU; the
steady-state numbers are printed from the warm second run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", type=float, default=8.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--factored", action="store_true",
                    help="V-free factored filter (models/factored.py): the "
                         "capacity mode past the stored-V ceiling")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()

    from nle_tpu.ops.pipeline import apply_filter_u8, train_filter
    from nle_tpu.ops.transform import transform_eigenvalues

    side = int(np.sqrt(args.mp * 1e6))
    H = W = side
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H // 16 + 2, W // 16 + 2)).astype(np.float32)
    chan = np.kron(base, np.ones((16, 16), np.float32))[:H, :W]
    chan = np.clip(chan + rng.normal(0, 8, (H, W)), 0, 255).astype(np.float32)
    print(f"image {H}x{W} = {H*W/1e6:.1f} MP, backend {jax.default_backend()}",
          flush=True)

    def run():
        t0 = time.time()
        if args.factored:
            from nle_tpu.models.factored import train_filter_factored

            ff = train_filter_factored(chan, 24, 25, hx=5000.0, hy=30.0,
                                       n_sinkhorn_iter=args.iters,
                                       n_eig_vectors=50)
            S = ff.eigvals
            k = int(np.asarray(S).size)
            np.asarray(ff.v_head[:1, :1])   # force async dispatches
            t1 = time.time()
            w = np.linspace(1.0, 1.5, k + 1).astype(np.float32)
            fS = transform_eigenvalues(S, jnp.asarray(w))
            out = ff.apply_u8(
                np.clip(np.rint(chan), 0, 255).astype(np.uint8), fS)
            t2 = time.time()
            return t1 - t0, t2 - t1, out
        V, S = train_filter(chan, 24, 25, hx=5000.0, hy=30.0,
                            n_sinkhorn_iter=args.iters, n_eig_vectors=50)
        k = int(np.asarray(S).size)
        # Force the async stage-2b build before the train/apply split (a
        # scalar fetch; block_until_ready can return early on axon).
        np.asarray(V[:1, :1])
        t1 = time.time()
        w = np.linspace(1.0, 1.5, k + 1).astype(np.float32)
        fS = transform_eigenvalues(S, jnp.asarray(w))
        y8 = jnp.asarray(
            np.clip(np.rint(chan), 0, 255).astype(np.uint8).reshape(-1))
        from nle_tpu.utils.transfer import fetch

        out = fetch(apply_filter_u8(V.reshape(H * W, -1), fS, y8))
        t2 = time.time()
        return t1 - t0, t2 - t1, out

    t_train, t_apply, _ = run()
    print(f"cold: train {t_train:.1f}s apply {t_apply:.1f}s", flush=True)
    t_train, t_apply, out = run()
    mps = H * W / 1e6 / (t_train + t_apply)
    print(f"warm: train {t_train:.1f}s apply {t_apply:.1f}s -> {mps:.2f} MP/s "
          f"(output mean {out.mean():.1f})", flush=True)


if __name__ == "__main__":
    main()
