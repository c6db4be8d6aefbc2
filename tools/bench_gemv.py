"""Time isolated XLA gemv passes over phi to establish the real per-sweep
bandwidth ceiling on this chip."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n, m = 1_001_472, 640
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32) * 0.05)
    v = jnp.asarray(rng.random(m).astype(np.float32))
    u = jnp.asarray(rng.random(n).astype(np.float32))
    bytes_ = 4 * n * m

    def timed(name, fn, args, sweeps):
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            float(jnp.sum(r[0] if isinstance(r, tuple) else r))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / sweeps
        print(f"{name:34s} {dt*1e3:7.2f} ms/sweep {bytes_/dt/1e9:7.1f} GB/s",
              flush=True)

    S = 20

    @jax.jit
    def fwd_many(phi, v):
        def body2(_, vv):
            w = phi @ vv
            return w[:m] * 1e-3
        return jax.lax.fori_loop(0, S, body2, v)

    timed("xla fwd gemv (phi @ v)", fwd_many, (phi, v), S)

    @jax.jit
    def bwd_many(phi, u):
        def body(_, uu):
            s = phi.T @ uu
            return jnp.pad(s, (0, n - m)) * 1e-3
        return jax.lax.fori_loop(0, S, body, u)

    timed("xla bwd gemv (phi.T @ u)", bwd_many, (phi, u), S)

    @jax.jit
    def pair_many(phi, v):
        def body(_, vv):
            w = phi @ vv                      # (n,)
            x = jnp.where(jnp.abs(w) >= 1e-10, 1.0 / w, 0.0)
            return (phi.T @ x) * 1e-6
        return jax.lax.fori_loop(0, S, body, v)

    timed("xla halfstep (2 gemv + recip)", pair_many, (phi, v), 2 * S)


if __name__ == "__main__":
    main()
