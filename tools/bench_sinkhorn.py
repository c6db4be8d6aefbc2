"""Micro-benchmark the Sinkhorn sweep kernel variants on the current backend.

Usage: python tools/bench_sinkhorn.py [n] [m] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 598
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp

    import nle_tpu.ops.pallas.sinkhorn_kernel as sk
    from nle_tpu.ops.sinkhorn import sinkhorn_vectors

    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32) * 0.05 + 0.1)
    lam = jnp.asarray((rng.random(m) + 0.5).astype(np.float32))
    sweep_bytes = 4 * n * ((m + 127) // 128 * 128)

    def force(out):
        # axon's block_until_ready can return before execution; a scalar
        # fetch forces it.
        r, c = out
        return float(jnp.sum(r)) + float(jnp.sum(c))

    def timed(name, fn, n_sweeps):
        force(fn(phi, lam))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(phi, lam))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        bw = n_sweeps * sweep_bytes / dt / 1e9
        print(f"{name:28s} {dt*1e3:8.1f} ms   {bw:7.1f} GB/s effective",
              flush=True)

    for tile in (512, 1024, 2048):
        fused = jax.jit(
            functools.partial(sk.sinkhorn_vectors_fused, max_iter=iters,
                              eps=1e-10, tile=tile)
        )
        timed(f"fused pallas TILE_N={tile}", fused, 2 * iters + 1)

    xla = jax.jit(functools.partial(sinkhorn_vectors, max_iter=iters, eps=1e-10))
    timed("xla two-pass", xla, 4 * iters)


if __name__ == "__main__":
    main()
