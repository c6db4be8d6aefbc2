"""Fused Gaussian-affinity x matrix Pallas TPU kernel.

Computes  out = K @ B  where  K[i, j] = exp(-||fb_i - fa_j||^2)  without ever
materializing K in HBM: each (TILE_Q, p) affinity block is generated in VMEM
from the pixel features (VPU: 3 broadcasted squared differences + exp) and
immediately contracted with B on the MXU.

This replaces the reference's hot loop #1 + the (p, N) K_AB buffer
(reference src/filter.cpp:130-145, README.md:96 memory wall): HBM traffic is
only the features (N*3), B (p*m) and the output (N*m).

Differences are computed per-coordinate (not via the |a|^2+|b|^2-2ab
expansion) to avoid catastrophic cancellation for nearby pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nle_tpu.ops.precision import dot_general_3pass, stage2_dots

TILE_Q = 512
# B lives whole in VMEM: limit p (and m <= p) so (Ppad, Mpad) + tiles fit.
MAX_PALLAS_P = 1024
# Sample-dimension tile of the p-tiled branch. ptiled_fits' VMEM arithmetic
# encodes this constant — keep them in sync (they live side by side for
# exactly that reason).
PTILE = 512


def ptiled_fits(m: int) -> bool:
    """Whether the p-tiled kernel's VMEM working set fits for a B of width
    m: the (TILE_Q, Mpad) accumulator + double-buffered (PTILE, Mpad) B
    slices + the (TILE_Q, PTILE) affinity tile. Independent of p — a narrow
    B (e.g. the k-column eigenvector tail) rides the fused kernel for ANY
    sampling-grid size."""
    mpad = _round_up(max(m, 1), 128)
    # Terms spelled out per buffer (NOT merged): the accumulator is
    # TILE_Q-tall but the two B slices are PTILE-tall — a merged
    # 3*TILE_Q*mpad only happens to be correct while PTILE == TILE_Q,
    # and retuning PTILE must not silently under-count VMEM.
    vmem = 4 * (TILE_Q * mpad          # output accumulator
                + 2 * PTILE * mpad     # double-buffered B slices
                + TILE_Q * PTILE)      # affinity tile
    return vmem <= 10 * 2**20


from nle_tpu.ops.pallas._common import round_up as _round_up


def _out_struct(shape, *operands):
    """ShapeDtypeStruct for a pallas output, vma-annotated when the inputs
    are varying (i.e. we are inside a shard_map with check_vma=True)."""
    try:
        vma = frozenset().union(*(jax.typeof(o).vma for o in operands))
    except Exception:
        vma = frozenset()
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _unify_vma(*operands):
    """pcast every operand to the union of their varying manual axes.

    Under shard_map(check_vma=True) a pallas kernel body may not mix
    operands with different varying-axis sets (e.g. per-'pixel'-shard
    features against 'pixel'-replicated sample features); broadcasting the
    replicated side to varying is free and makes the kernel vma-uniform."""
    try:
        vmas = [jax.typeof(o).vma for o in operands]
    except Exception:
        return operands
    union = frozenset().union(*vmas)
    if not union:
        return operands
    out = []
    for o, v in zip(operands, vmas):
        missing = tuple(sorted(union - v))
        out.append(jax.lax.pcast(o, missing, to="varying") if missing else o)
    return tuple(out)


def _dot_kb(k, b):
    """The kernels' (tile, p) @ (p, m) contraction, NLE_STAGE2_DOTS-gated
    ("phi" site). DEFAULTS TO THE EXACT 6-pass dot: this product
    (K_AB @ Uinv) is cancellation-heavy — eigenvector columns oscillate —
    and the 3-pass split's 2^-16 term-relative error is O(1) relative to
    the small cancelled entries, collapsing bird to 8.3 dB (CPU golden
    bisection, ops/precision.py module docstring). The gate exists for
    experimentation only; the safe split sites are the gram and V tail."""
    if stage2_dots("phi") == "high":
        return dot_general_3pass(k, b, (((1,), (0,)), ((), ())))
    return jnp.dot(k, b, preferred_element_type=jnp.float32)


def _row_mask(q_true: int, tile_rows: int):
    """(tile_rows, 1) bool mask of rows whose GLOBAL index is < q_true —
    the zero_tail contract: direct-write padded outputs must carry exact
    zeros past the true row count (pad features are zeros, which produce
    NONZERO affinities against real samples)."""
    i = pl.program_id(0)
    rows = (i * tile_rows
            + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0))
    return rows < q_true


def _kernel(sw_ref, pw_ref, fb_ref, fa_ref, b_ref, out_ref, *,
            q_true: int | None = None):
    sw = sw_ref[0, 0]
    pw = pw_ref[0, 0]
    dr = fb_ref[:, 0:1] - fa_ref[0:1, :]
    dc = fb_ref[:, 1:2] - fa_ref[1:2, :]
    dy = fb_ref[:, 2:3] - fa_ref[2:3, :]
    # Raw integer differences are exact in f32; scale only after squaring.
    k = jnp.exp(-(sw * (dr * dr + dc * dc) + pw * (dy * dy)))
    out = _dot_kb(k, b_ref[:])
    if q_true is not None:
        out = jnp.where(_row_mask(q_true, out.shape[0]), out, 0.0)
    out_ref[:] = out


def _kernel_ptiled(sw_ref, pw_ref, fb_ref, fa_ref, b_ref, out_ref, *,
                   q_true: int | None = None):
    """As _kernel, but the sample (p) dimension is a second grid axis with
    the output block revisited and accumulated — supports p beyond what a
    whole (p, m) B block in VMEM allows."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sw = sw_ref[0, 0]
    pw = pw_ref[0, 0]
    dr = fb_ref[:, 0:1] - fa_ref[0:1, :]
    dc = fb_ref[:, 1:2] - fa_ref[1:2, :]
    dy = fb_ref[:, 2:3] - fa_ref[2:3, :]
    k = jnp.exp(-(sw * (dr * dr + dc * dc) + pw * (dy * dy)))
    out = _dot_kb(k, b_ref[:])
    if q_true is not None:
        out = jnp.where(_row_mask(q_true, out.shape[0]), out, 0.0)
    out_ref[:] += out


@functools.partial(jax.jit, static_argnames=("interpret", "out_rows"))
def affinity_matmul_pallas(fa: jax.Array, fb: jax.Array, B: jax.Array,
                           sw, pw, interpret: bool = False,
                           out_rows: int | None = None) -> jax.Array:
    """out (q, m) = exp-affinity(fb, fa) @ B.

    fa: (p, 3) raw sample-pixel features (row, col, intensity); fb: (q, 3)
    pixel features; B: (p, m) right factor; sw/pw bandwidth weights.
    Zero-padded to hardware tiles; pad columns of the affinity block are
    annihilated by B's zero pad rows.

    out_rows: DIRECT-WRITE padded layout — return the full (out_rows,
    mpad128) buffer with rows >= q and columns >= m EXACT ZERO, instead of
    slicing to (q, m). The split-buffer stage 2a consumes the result as
    its Sinkhorn/gram rest block without any assembly copy (the zeros+DUS
    assembly it replaces measured ~35 ms at 1 MP,
    tools/profile_stage2a_parts.py). Must be a TILE_Q multiple >= q; the
    tail rows are masked IN-KERNEL (pad features are zeros, which would
    otherwise produce nonzero affinities against real samples)."""
    p = fa.shape[0]
    q = fb.shape[0]
    m = B.shape[1]
    if out_rows is not None and (out_rows % TILE_Q or out_rows < q):
        raise ValueError(
            f"out_rows ({out_rows}) must be a TILE_Q ({TILE_Q}) multiple "
            f">= the true row count ({q})")
    if not ptiled_fits(m):
        # Loud, early: past this width even the p-tiled branch's VMEM
        # working set cannot fit and Mosaic would die with an opaque
        # compile-time error. Route wide-B requests through
        # affinity_matmul (ops/affinity.py), which falls back to the
        # tiled XLA builder.
        raise ValueError(
            f"B width {m} exceeds the p-tiled kernel's VMEM budget "
            "(ptiled_fits); use affinity_matmul, which auto-falls back "
            "to the XLA builder.")
    ppad = _round_up(p, 128)
    mpad = _round_up(m, 128)
    qpad = (out_rows if out_rows is not None
            else _round_up(max(q, 1), TILE_Q))
    # Mask tail rows whenever the padded buffer is returned; the sliced
    # form never exposes them.
    q_true = q if out_rows is not None else None

    fa_rows = jnp.pad(fa.T, ((0, 0), (0, ppad - p)))          # (3, Ppad)
    # fb stays (Qpad, 3) DELIBERATELY despite the repo's row-major-in-N
    # layout rule: with a (TILE_Q, 3) BlockSpec the tiled HBM->VMEM DMA
    # pays no relayout temp (MEASURED 2026-08-18 at 8M rows: 62.5 ms vs
    # 64.8 ms for a (3, Qpad) row variant — identical within noise). The
    # rule's hidden 512 B/px copy applies to whole-array/minor-dim-sliced
    # operands (streaming_kernel.py's measured case), not to this shape.
    fb_cols = jnp.pad(fb, ((0, qpad - q), (0, 0)))            # (Qpad, 3)
    bp = jnp.pad(B, ((0, ppad - p), (0, mpad - m)))           # (Ppad, Mpad)

    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    # vma uniformity under shard_map(check_vma=True): replicated scalars /
    # sample features must match the pixel-sharded fb's varying axes (the
    # streaming kernels do the same; pcast is a no-op single-chip).
    sw2, pw2, fb_cols, fa_rows, bp = _unify_vma(
        sw2, pw2, fb_cols, fa_rows, bp)

    def cost_for(ppad_: int) -> pl.CostEstimate:
        # Per-branch: the p-tiled branch re-pads p to a PTILE multiple, so
        # a cost built with the dense branch's 128-aligned ppad would
        # under-report its work to the scheduler.
        return pl.CostEstimate(
            flops=2 * qpad * ppad_ * (mpad + 4),
            bytes_accessed=4 * (qpad * 3 + 3 * ppad_ + ppad_ * mpad
                                + qpad * mpad),
            transcendentals=qpad * ppad_,
        )

    dense_vmem = 4 * (ppad * mpad + 3 * TILE_Q * mpad + TILE_Q * ppad)
    if ppad <= MAX_PALLAS_P and dense_vmem <= 10 * 2**20:
        out = pl.pallas_call(
            functools.partial(_kernel, q_true=q_true),
            grid=(qpad // TILE_Q,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE_Q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, ppad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ppad, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_Q, mpad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=_out_struct((qpad, mpad), fb_cols, fa_rows, bp),
            cost_estimate=cost_for(ppad),
            interpret=interpret,
        )(sw2, pw2, fb_cols, fa_rows, bp)
        return out if out_rows is not None else out[:q, :m]

    # Dense sampling grids (p > MAX_PALLAS_P): tile the sample dimension as
    # a second (inner, sequential) grid axis and accumulate into revisited
    # output blocks; B streams in (PTILE, Mpad) slices.
    ppad = _round_up(p, PTILE)
    fa_rows = jnp.pad(fa.T, ((0, 0), (0, ppad - p)))
    bp = jnp.pad(B, ((0, ppad - p), (0, mpad - m)))
    sw2, pw2, fb_cols, fa_rows, bp = _unify_vma(
        sw2, pw2, fb_cols, fa_rows, bp)
    out = pl.pallas_call(
        functools.partial(_kernel_ptiled, q_true=q_true),
        grid=(qpad // TILE_Q, ppad // PTILE),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_Q, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PTILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((PTILE, mpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_Q, mpad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((qpad, mpad), fb_cols, fa_rows, bp),
        cost_estimate=cost_for(ppad),
        interpret=interpret,
    )(sw2, pw2, fb_cols, fa_rows, bp)
    return out if out_rows is not None else out[:q, :m]
