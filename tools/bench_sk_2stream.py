"""Does splitting each chunk into two concurrently-started DMAs raise the
streaming rate past the single-stream ~545 GB/s ceiling?"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(nstreams, chunk, npad, mpad):
    half = chunk // nstreams

    def kernel(t_ref, phi_hbm, s_ref, buf, sems, *, nchunks):
        def dma(slot, stream, idx):
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(idx * chunk + stream * half, half), :],
                buf.at[slot, stream],
                sems.at[slot, stream],
            )

        def start_all(slot, idx):
            for st in range(nstreams):
                dma(slot, st, idx).start()

        def wait_all(slot, idx):
            for st in range(nstreams):
                dma(slot, st, idx).wait()

        s_ref[:] = jnp.zeros_like(s_ref)
        start_all(0, 0)

        def body(i, _):
            slot = i % 2

            @pl.when(i + 1 < nchunks)
            def _():
                start_all((i + 1) % 2, i + 1)

            wait_all(slot, i)
            # touch data
            s_ref[0:1, :] += buf[slot, 0, 0:1, :]
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

    @jax.jit
    def run(phi_pad, t):
        return pl.pallas_call(
            functools.partial(kernel, nchunks=npad // chunk),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, mpad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, nstreams, half, mpad), jnp.float32),
                pltpu.SemaphoreType.DMA((2, nstreams)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(t[None, :], phi_pad)

    return run


def main():
    n, m, sweeps = 1_000_000, 640, 10
    npad = -(-n // 2048) * 2048
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((npad, m)).astype(np.float32) * 0.05)
    t0v = jnp.asarray(rng.random(m).astype(np.float32))
    sweep_bytes = 4 * npad * m

    for nstreams in (1, 2, 4):
        for chunk in (1024, 2048):
            fn = make(nstreams, chunk, npad, m)

            @jax.jit
            def many(phi, t):
                def body(_, acc):
                    return acc + fn(phi, t)[0, 0]
                return jax.lax.fori_loop(0, sweeps, body, jnp.float32(0))

            float(many(phi, t0v))
            ts = []
            for _ in range(3):
                tt = time.perf_counter()
                float(many(phi, t0v))
                ts.append(time.perf_counter() - tt)
            dt = min(ts)
            print(f"streams={nstreams} chunk={chunk:5d} "
                  f"{dt/sweeps*1e3:7.2f} ms/sweep "
                  f"{sweep_bytes/(dt/sweeps)/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
