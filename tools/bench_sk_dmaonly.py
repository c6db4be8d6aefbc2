"""Measure the manual pipeline's pure DMA ceiling (no dots) and the
w-dot-only cost, to attribute the fused halfstep's 4.7 ms/sweep."""

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

from nle_tpu.config import enable_persistent_cache

enable_persistent_cache()


def make(variant, chunk, npad, mpad):
    NS = int(os.environ.get("NSLOTS", "2"))

    def kernel(t_ref, phi_hbm, s_ref, buf, sems, *, nchunks):
        def phi_dma(slot, idx):
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(idx * chunk, chunk), :], buf.at[slot],
                sems.at[slot])

        s_ref[:] = jnp.zeros_like(s_ref)
        for w in range(NS - 1):
            @pl.when(w < nchunks)
            def _(w=w):
                phi_dma(w % NS, w).start()

        def body(i, _):
            slot = i % NS

            @pl.when(i + NS - 1 < nchunks)
            def _():
                phi_dma((i + NS - 1) % NS, i + NS - 1).start()

            phi_dma(slot, i).wait()
            phi = buf[slot]
            if variant == "dmaonly":
                # touch one row so the load isn't dead
                s_ref[0:1, :phi.shape[1]] += phi[0:1, :]
            elif variant == "wonly":
                w = jax.lax.dot_general(
                    t_ref[:], phi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_ref[0:1, :1024] = s_ref[0:1, :1024] + w[:, :1024]
            else:  # wpart
                w = jax.lax.dot_general(
                    t_ref[:], phi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                part = jnp.dot(w, phi, preferred_element_type=jnp.float32)
                s_ref[0:1, :part.shape[1]] = s_ref[0:1, :part.shape[1]] + part
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
            out_shape=jax.ShapeDtypeStruct((8, max(mpad, chunk)), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NS, chunk, mpad), jnp.float32),
                pltpu.SemaphoreType.DMA((NS,)),
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

    variants = os.environ.get("VARIANTS", "dmaonly,wpart").split(",")
    chunks = [int(c) for c in os.environ.get("CHUNKS", "512,1024").split(",")]
    for variant in variants:
        for chunk in chunks:
            fn = make(variant, chunk, npad, m)

            @jax.jit
            def many(phi, t):
                def body(_, acc):
                    return acc + fn(phi, t)[0, 0]
                return jax.lax.fori_loop(0, sweeps, body, jnp.float32(0))

            float(many(phi, t0v))
            times = []
            for _ in range(3):
                tt = time.perf_counter()
                float(many(phi, t0v))
                times.append(time.perf_counter() - tt)
            dt = min(times)
            print(f"{variant:8s} chunk={chunk:5d} {dt/sweeps*1e3:7.2f} ms/sweep "
                  f"{sweep_bytes/(dt/sweeps)/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
