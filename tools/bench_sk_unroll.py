"""Test a 2x-unrolled manual-DMA halfstep (independent dot pairs per body)
against the production manual kernel."""

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

from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_halfstep_manual


def _kernel_unroll(eps_ref, t_ref, phi_hbm, x_hbm, s_ref, buf, xbuf, sems,
                   xsems, *, chunk: int, npairs: int):
    nslots = 4

    def phi_dma(slot, idx):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(idx * chunk, chunk), :], buf.at[slot], sems.at[slot]
        )

    def x_dma(slot, idx):
        return pltpu.make_async_copy(
            xbuf.at[slot], x_hbm.at[idx], xsems.at[slot]
        )

    s_ref[:] = jnp.zeros_like(s_ref)
    phi_dma(0, 0).start()
    phi_dma(1, 1).start()
    nchunks = 2 * npairs

    def body(j, _):
        a = 2 * j
        sa = a % nslots
        sb = (a + 1) % nslots

        @pl.when(a + 2 < nchunks)
        def _():
            phi_dma((a + 2) % nslots, a + 2).start()

        @pl.when(a + 3 < nchunks)
        def _():
            phi_dma((a + 3) % nslots, a + 3).start()

        phi_dma(sa, a).wait()
        phi_dma(sb, a + 1).wait()
        phi_a = buf[sa]
        phi_b = buf[sb]
        eps = eps_ref[0, 0]
        wa = jax.lax.dot_general(t_ref[:], phi_a,
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        wb = jax.lax.dot_general(t_ref[:], phi_b,
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        va = jnp.abs(wa) >= eps
        xa = jnp.where(va, 1.0 / jnp.where(va, wa, 1.0), 0.0)
        vb = jnp.abs(wb) >= eps
        xb = jnp.where(vb, 1.0 / jnp.where(vb, wb, 1.0), 0.0)

        @pl.when(j >= 2)
        def _():
            x_dma(sa, a - 4).wait()
            x_dma(sb, a - 3).wait()

        xbuf[sa, 0:1, :] = xa
        xbuf[sb, 0:1, :] = xb
        x_dma(sa, a).start()
        x_dma(sb, a + 1).start()
        pa = jnp.dot(xa, phi_a, preferred_element_type=jnp.float32)
        pb = jnp.dot(xb, phi_b, preferred_element_type=jnp.float32)
        row = (2 * j) % 8
        s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + pa
        row2 = (2 * j + 1) % 8
        s_ref[pl.ds(row2, 1), :] = s_ref[pl.ds(row2, 1), :] + pb
        return 0

    jax.lax.fori_loop(0, npairs, body, 0)
    for back in (4, 3, 2, 1):
        idx = nchunks - back

        @pl.when(idx >= 0)
        def _(idx=idx):
            x_dma(idx % nslots, idx).wait()


@functools.partial(jax.jit, static_argnames=("chunk",))
def halfstep_unroll(phi_pad, t, eps, chunk=1024):
    npad, mpad = phi_pad.shape
    npairs = npad // (2 * chunk)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    x, s8 = pl.pallas_call(
        functools.partial(_kernel_unroll, chunk=chunk, npairs=npairs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2 * npairs, 8, chunk), jnp.float32),
            jax.ShapeDtypeStruct((8, mpad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, chunk, mpad), jnp.float32),
            pltpu.VMEM((4, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(eps2, t[None, :], phi_pad)
    return x[:, 0, :].reshape(npad), jnp.sum(s8, axis=0)


def main():
    n, m, sweeps = 1_000_000, 640, 20
    npad = -(-n // 4096) * 4096
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
        ref = float(jnp.sum(r[0])) + float(jnp.sum(r[1]))
        times = []
        for _ in range(3):
            tt = time.perf_counter()
            r = many(phi, t0v)
            float(jnp.sum(r[0]))
            times.append(time.perf_counter() - tt)
        dt = min(times)
        print(f"{name:22s} {dt/sweeps*1e3:7.2f} ms/sweep "
              f"{sweep_bytes/(dt/sweeps)/1e9:7.1f} GB/s checksum={ref:.6g}",
              flush=True)

    run("manual chunk=1024", functools.partial(sinkhorn_halfstep_manual, chunk=1024))
    for chunk in (512, 1024):
        run(f"unroll2 chunk={chunk}", functools.partial(halfstep_unroll, chunk=chunk))


if __name__ == "__main__":
    main()
