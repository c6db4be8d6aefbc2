"""Compare auto-pipelined vs manual-DMA fused halfstep on TPU."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from nle_tpu.ops.pallas.sinkhorn_kernel import (
    sinkhorn_halfstep_manual,
    sinkhorn_halfstep_pallas,
)


def main():
    n, m, sweeps = 1_000_000, 640, 20
    npad = -(-n // 2048) * 2048
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((npad, m)).astype(np.float32) * 0.05 + 0.1)
    t0v = jnp.asarray(rng.random(m).astype(np.float32))
    sweep_bytes = 4 * npad * m

    def run(name, halfstep):
        @jax.jit
        def many(phi, t):
            def body(_, st):
                x, s = halfstep(phi, st[1], 1e-10)
                return x, s
            return jax.lax.fori_loop(0, sweeps, body,
                                     (jnp.zeros((npad,), jnp.float32), t))

        r = many(phi, t0v)
        ref = float(jnp.sum(r[0]))
        times = []
        for _ in range(3):
            tt = time.perf_counter()
            r = many(phi, t0v)
            float(jnp.sum(r[0]))
            times.append(time.perf_counter() - tt)
        dt = min(times)
        print(f"{name:22s} {dt/sweeps*1e3:7.2f} ms/sweep "
              f"{sweep_bytes/(dt/sweeps)/1e9:7.1f} GB/s  checksum={ref:.6g}",
              flush=True)

    pass  # auto variant measured already
    for chunk in (512, 1024, 2048):
        run(f"manual chunk={chunk}",
            functools.partial(sinkhorn_halfstep_manual, chunk=chunk))


if __name__ == "__main__":
    main()
