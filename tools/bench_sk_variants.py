"""Micro-bench alternative fused-halfstep kernel formulations on TPU."""

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


def make_halfstep(variant, tile, npad, mpad):
    def kernel_mxu(eps_ref, t_ref, phi_ref, x_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        w = jax.lax.dot_general(phi_ref[:], t_ref[:],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        eps = eps_ref[0, 0]
        valid = jnp.abs(w) >= eps
        x = jnp.where(valid, 1.0 / jnp.where(valid, w, 1.0), 0.0)
        x_ref[:] = x
        part = jax.lax.dot_general(x, phi_ref[:],
                                   dimension_numbers=(((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        row = i % 8
        s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + part

    def kernel_vpu(eps_ref, t_ref, phi_ref, x_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        phi = phi_ref[:]
        w = jnp.sum(phi * t_ref[:], axis=1, keepdims=True)
        eps = eps_ref[0, 0]
        valid = jnp.abs(w) >= eps
        x = jnp.where(valid, 1.0 / jnp.where(valid, w, 1.0), 0.0)
        x_ref[:] = x
        part = jnp.sum(phi * x, axis=0, keepdims=True)
        row = i % 8
        s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + part

    def kernel_mxu_row0(eps_ref, t_ref, phi_ref, x_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        w = jax.lax.dot_general(phi_ref[:], t_ref[:],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        eps = eps_ref[0, 0]
        valid = jnp.abs(w) >= eps
        x = jnp.where(valid, 1.0 / jnp.where(valid, w, 1.0), 0.0)
        x_ref[:] = x
        part = jax.lax.dot_general(x, phi_ref[:],
                                   dimension_numbers=(((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s_ref[0:1, :] = s_ref[0:1, :] + part

    def kernel_xonly(eps_ref, t_ref, phi_ref, x_ref, s_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)

        w = jax.lax.dot_general(phi_ref[:], t_ref[:],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        eps = eps_ref[0, 0]
        valid = jnp.abs(w) >= eps
        x_ref[:] = jnp.where(valid, 1.0 / jnp.where(valid, w, 1.0), 0.0)

    if variant == "parts3d":
        def kernel_parts3d(eps_ref, t_ref, phi_ref, x_ref, p_ref):
            w = jax.lax.dot_general(phi_ref[:], t_ref[:],
                                    dimension_numbers=(((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            eps = eps_ref[0, 0]
            valid = jnp.abs(w) >= eps
            x = jnp.where(valid, 1.0 / jnp.where(valid, w, 1.0), 0.0)
            x_ref[:] = x
            part = jax.lax.dot_general(x, phi_ref[:],
                                       dimension_numbers=(((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            p_ref[:] = jnp.broadcast_to(part, p_ref.shape)

        @functools.partial(jax.jit)
        def halfstep3d(phi_pad, t, eps):
            eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
            n_tiles = npad // tile
            x, parts = pl.pallas_call(
                kernel_parts3d,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, mpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((npad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((n_tiles, 8, mpad), jnp.float32),
                ),
            )(eps2, t[None, :], phi_pad)
            return x[:, 0], jnp.sum(parts[:, 0, :], axis=0)

        return halfstep3d

    kern = {"mxu": kernel_mxu, "vpu": kernel_vpu, "mxu_row0": kernel_mxu_row0,
            "xonly": kernel_xonly}[variant]

    @functools.partial(jax.jit)
    def halfstep(phi_pad, t, eps):
        eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
        x, s8 = pl.pallas_call(
            kern,
            grid=(npad // tile,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((npad, 1), jnp.float32),
                jax.ShapeDtypeStruct((8, mpad), jnp.float32),
            ),
        )(eps2, t[None, :], phi_pad)
        return x[:, 0], jnp.sum(s8, axis=0)

    return halfstep


def main():
    n, m, sweeps = 1_000_000, 640, 20
    npad = -(-n // 2048) * 2048
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((npad, m)).astype(np.float32) * 0.05 + 0.1)
    t0v = jnp.asarray(rng.random(m).astype(np.float32))
    sweep_bytes = 4 * npad * m

    for variant in ("xonly", "parts3d"):
        for tile in (1024, 2048):
            hs = make_halfstep(variant, tile, npad, m)

            @jax.jit
            def many(phi, t):
                def body(_, st):
                    x, s = hs(phi, st[1], 1e-10)
                    return x, s
                return jax.lax.fori_loop(0, sweeps, body,
                                         (jnp.zeros((npad,), jnp.float32), t))

            r = many(phi, t0v)
            float(jnp.sum(r[0]))
            times = []
            for _ in range(3):
                tt = time.perf_counter()
                r = many(phi, t0v)
                float(jnp.sum(r[0]))
                times.append(time.perf_counter() - tt)
            dt = min(times)
            print(f"{variant:9s} tile={tile:5d}  {dt/sweeps*1e3:7.2f} ms/sweep "
                  f"{sweep_bytes/(dt/sweeps)/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
