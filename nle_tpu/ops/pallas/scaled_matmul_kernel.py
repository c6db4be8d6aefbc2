"""Fused row-scaled Gram / matmul Pallas TPU kernels.

The factored orthogonalization needs two products of the row-scaled factor
cphi = diag(c) @ phi (rows below the balanced block):

    Sb = cphi^T @ cphi          (m, m)   — the Wab Wab^T inner term
    Vb = cphi @ GrT             (N-m, k) — the eigenvector tail

Materializing cphi costs an extra N*m float32 HBM buffer — at m = 600 that
halves the largest image one chip can hold. These kernels fuse the diag(c)
scaling into the MXU contraction so phi is the only N-scale array alive.
Row offsets/padding are handled by the caller zeroing c outside [lo, n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


from nle_tpu.ops.pallas._common import round_up as _round_up
from nle_tpu.ops.precision import dot_general_3pass, stage2_dots


def gram_tile(mpad: int) -> int:
    """Row tile of the gram kernel (shrunk for wide factors so the
    accumulator + blocks fit VMEM) — one definition for the kernel and the
    fit predicate."""
    return TILE if mpad <= 512 else TILE // 2


def scaled_fits_vmem(m: int) -> bool:
    """Whether the fused kernels' VMEM working sets fit for a factor of
    width m. The binding constraint is the GRAM kernel's (Mpad, Mpad)
    accumulator + double-buffered (tile, Mpad) blocks + the scaled-tile
    temp — MEASURED on v5e (2026-08-18 compile probes): OK through
    mpad = 1280 (model: 14.4 MB), Mosaic VMEM failure from mpad = 1408
    (16.6 MB); the matmul kernel is looser (OK at 1536 with kpad = 128).
    15 MiB against this working-set model reproduces the measured
    boundary. Dense sampling grids past it must take the cphi/streaming
    formulations — dispatchers consult this predicate (stage2_dense_small,
    train_filter's streaming rule); an unguarded call would die in
    Mosaic's VMEM check at train-time compile."""
    mpad = _round_up(max(m, 1), 128)
    tg = gram_tile(mpad)
    gram = 4 * (mpad * mpad + 2 * tg * (mpad + 1) + tg * mpad)
    return gram <= 15 * 2**20


def _gram_kernel(c_ref, phi_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cphi = phi_ref[:] * c_ref[:]
    # NLE_STAGE2_DOTS-gated (trace time): 3-pass split halves the MXU
    # passes of the large-image Sb gram (see affinity_kernel._dot_kb).
    if stage2_dots("gram", in_kernel=True) == "high":
        out_ref[:] += dot_general_3pass(
            cphi, cphi, (((0,), (0,)), ((), ())))
    else:
        out_ref[:] += jax.lax.dot_general(
            cphi, cphi,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def scaled_gram_pallas(phi_pad: jax.Array, c_pad: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """(diag(c) phi)^T (diag(c) phi) with the scaling fused; phi_pad
    (Npad, Mpad) and c_pad (Npad, 1) — rows to exclude must have c = 0."""
    npad, mpad = phi_pad.shape
    # The (Mpad, Mpad) accumulator plus the scaled-tile temp must fit VMEM
    # alongside the double-buffered phi blocks; shrink the row tile for
    # wide factors.
    tile = gram_tile(mpad)
    if npad % tile != 0:
        raise ValueError(
            f"phi rows ({npad}) must be a multiple of the row tile ({tile})"
            " — silent tail-row drop otherwise")
    out = pl.pallas_call(
        _gram_kernel,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mpad, mpad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mpad, mpad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * mpad,
            bytes_accessed=4 * (npad * mpad + npad + mpad * mpad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(c_pad, phi_pad)
    return out


def _matmul_kernel(c_ref, phi_ref, b_ref, out_ref):
    cphi = phi_ref[:] * c_ref[:]
    if stage2_dots("v", in_kernel=True) == "high":
        out_ref[:] = dot_general_3pass(
            cphi, b_ref[:], (((1,), (0,)), ((), ())))
    else:
        out_ref[:] = jnp.dot(cphi, b_ref[:],
                             preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scaled_matmul_pallas(phi_pad: jax.Array, c_pad: jax.Array,
                         B: jax.Array, interpret: bool = False) -> jax.Array:
    """(diag(c) phi) @ B with the scaling fused; B (Mpad, kpad128)."""
    npad, mpad = phi_pad.shape
    kpad = B.shape[1]
    if npad % TILE != 0:
        raise ValueError(
            f"phi rows ({npad}) must be a multiple of TILE ({TILE})"
            " — silent tail-row drop otherwise")
    out = pl.pallas_call(
        _matmul_kernel,
        grid=(npad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, mpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mpad, kpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, kpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, kpad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * kpad,
            bytes_accessed=4 * (npad * mpad + npad + mpad * kpad + npad * kpad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(c_pad, phi_pad, B)
    return out
