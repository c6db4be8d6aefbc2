"""Serving-throughput benchmark: sequential vs pipelined multi-image
training at ~1 MP (models/batch.py). The pipelined driver overlaps the host
f64 islands (stage 1 eigh, orthogonalization chain) with the device's
Sinkhorn sweeps of the neighboring images.

Usage: python tools/bench_batch.py [--n=6] [--platform=cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np


def main():
    n_imgs = 6
    platform = None
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n_imgs = int(a.split("=", 1)[1])
        elif a.startswith("--platform="):
            platform = a.split("=", 1)[1]
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()

    from bench_input import load_input
    from nle_tpu.color.lab import bgr_to_lab_u8_np
    from nle_tpu.models.batch import train_filters_pipelined
    from nle_tpu.ops.pipeline import train_filter

    img = load_input(1.0)
    base = bgr_to_lab_u8_np(img)[..., 0].astype(np.float32)
    rng = np.random.default_rng(0)
    # Same scene with small perturbations: a realistic serving stream that
    # keeps the kept-rank m (and so the compile cache) stable.
    chans = [np.clip(base + rng.integers(-2, 3, base.shape), 0, 255)
             .astype(np.float32) for _ in range(n_imgs)]
    params = dict(hx=500.0, hy=10.0, n_sinkhorn_iter=50, n_eig_vectors=50)
    mp = base.size / 1e6

    # warm both drivers over EVERY channel: the kept-rank m is
    # data-dependent and each new m compiles a new stage-2 program — that
    # cost must not land inside either timed loop.
    for c in chans:
        train_filter(c, 20, 30, **params)
    train_filters_pipelined(chans, 20, 30, params["hx"], params["hy"],
                            params["n_sinkhorn_iter"],
                            params["n_eig_vectors"])

    # Force completion with a scalar FETCH, not block_until_ready: on the
    # axon platform block_until_ready can return before execution completes
    # (CLAUDE.md), which would under-measure the sequential side.
    t0 = time.perf_counter()
    for c in chans:
        V, S = train_filter(c, 20, 30, **params)
    np.asarray(V[:1, :1])
    seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    flts = train_filters_pipelined(chans, 20, 30, params["hx"], params["hy"],
                                   params["n_sinkhorn_iter"],
                                   params["n_eig_vectors"])
    np.asarray(flts[-1].eigvecs[:1, :1])
    pipe = time.perf_counter() - t0

    print(f"{n_imgs} x {mp:.2f} MP  sequential {seq:.2f}s "
          f"({n_imgs*mp/seq:.2f} MP/s)  pipelined {pipe:.2f}s "
          f"({n_imgs*mp/pipe:.2f} MP/s)  speedup {seq/pipe:.2f}x")


if __name__ == "__main__":
    main()
