"""Streaming (phi-free) stage-2 Pallas kernels for very large images.

The dense pipeline materializes the Nystrom factor phi (N, m) in HBM and
streams it through every Sinkhorn half-step — at m ~ 600 that is ~2.4 kB of
HBM per pixel, which caps a 16 GB v5e chip at ~5 MP. These kernels instead
RECOMPUTE the affinity tiles from the raw pixel features (16 B per pixel)
inside every pass, using the factor identities

    phi_rest @ t      = K_AB^T @ (Uinv @ t)          (one affinity matvec)
    phi_rest^T @ x    = Uinv^T @ (K_AB @ x)          (same tiles, transposed)
    Sb  = (c phi)^T (c phi)  accumulated per tile
    Vb  = c * (K_AB^T @ (Uinv @ GrT))                (plain affinity matmul)

so NO N x m array ever exists: per-pixel state is features + the balancing
vectors (+ the final V (N, k) on the dense-filter path; the factored filter
in models/factored.py drops even that).

LAYOUT RULE (load-bearing for capacity): every N-long operand crossing into
a pallas_call is shaped (rows, N) — features as ONE (3, Qpad) array, masks
and vectors as (1, Qpad) rows. Pallas forces an T(8,128) tiling on its
operands, so the "natural" (N, 3) / (N, 1) shapes get relayout-copied to
128 padded lanes: 512 B per pixel of hidden HBM traffic and peak memory
(measured: a (4M, 1) operand costs a 2.1 GB temp; the (1, 4M) row costs
none) — which silently capped the streaming path far below its design
size. Row layouts cost 4 B/px (vectors) / 16 B/px (features), copy-free.

Cost: one exp per (pixel, sample) per pass (two for the p-tiled two-pass
variant) — VPU-bound; the pipeline auto-selects streaming only when phi
would not fit (see ops/pipeline.py NLE_STREAM_BYTES).

Numerics: the affinity entries are bit-identical to the ones the dense path
stored in phi (same kernel arithmetic); only the contraction association
differs ((K^T Uinv) t vs K^T (Uinv t)), an ~1e-7 relative difference of the
same class as the accepted f32-vs-f64 deviations (tests/test_streaming.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nle_tpu.ops.linalg import safe_reciprocal
from nle_tpu.ops.pallas.affinity_kernel import _out_struct, _unify_vma

TILE_Q = 512
# Sample-dimension tile of the two-pass halfstep (dense sampling grids).
PTILE = 1024
# Up to this Ppad the single-pass halfstep holds the whole (TILE_Q, Ppad)
# affinity tile in VMEM (one exp per entry per sweep); beyond it the
# two-pass p-tiled kernel takes over (two exps, unbounded p).
MAX_STREAM_P_FUSED = 1792


from nle_tpu.ops.pallas._common import round_up as _round_up


def stream_p_alignment(p: int) -> int:
    """Sample-dimension padding rule shared by the streaming kernels: 128
    while the single-pass halfstep applies, PTILE once the p-tiled two-pass
    kernel takes over."""
    return 128 if _round_up(p, 128) <= MAX_STREAM_P_FUSED else PTILE


def _ptile(ppad: int) -> int:
    """Sample-tile width for the p-tiled kernels (whole Ppad in one tile
    while the single-pass regime applies)."""
    return (PTILE if ppad % PTILE == 0 and ppad > MAX_STREAM_P_FUSED
            else ppad)


def pad_stream_operands(fa: jax.Array, fb: jax.Array):
    """The ONE padding rule all streaming kernels share: sample features
    transposed to (3, Ppad), rest features transposed to (3, Qpad), and a
    (1, Qpad) validity-mask row. Qpad is a TILE_Q multiple, Ppad a
    stream_p_alignment multiple. Every caller must use this helper so the
    kernels see identical layouts (XLA CSE dedupes repeated pads within one
    jit). See the module docstring for why everything is row-major in N."""
    p = fa.shape[0]
    q = fb.shape[0]
    qpad = _round_up(max(q, 1), TILE_Q)
    ppad = _round_up(p, stream_p_alignment(p))
    fa_rows = jnp.pad(fa.T, ((0, 0), (0, ppad - p)))
    fb_cols = jnp.pad(fb.T, ((0, 0), (0, qpad - q)))
    mask = (jnp.arange(qpad, dtype=jnp.int32) < q).astype(jnp.float32)[None, :]
    return fa_rows, fb_cols, mask


def _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref):
    """(T, pt) affinity tile from a (3, T) pixel-feature slice and a
    (3, pt) sample-feature slice."""
    sw = sw_ref[0, 0]
    pw = pw_ref[0, 0]
    dr = fb_ref[0:1, :].T - fa_ref[0:1, :]
    dc = fb_ref[1:2, :].T - fa_ref[1:2, :]
    dy = fb_ref[2:3, :].T - fa_ref[2:3, :]
    # Raw integer differences are exact in f32; scale only after squaring
    # (the precision rule from ops/affinity.py).
    return jnp.exp(-(sw * (dr * dr + dc * dc) + pw * (dy * dy)))


def _halfstep_kernel(sw_ref, pw_ref, eps_ref, u_ref, fb_ref, mask_ref,
                     fa_ref, x_ref, ap_ref, *, unit_x: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ap_ref[:] = jnp.zeros_like(ap_ref)

    A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)      # (T, Ppad)
    if unit_x:
        # s0 pass: x = r0 = 1 on real rows (phi^T @ ones).
        x = mask_ref[:]                                     # (1, T)
    else:
        w = jax.lax.dot_general(
            u_ref[:], A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (1, T)
        x = safe_reciprocal(w, eps_ref[0, 0])
        x = x * mask_ref[:]   # pad rows: affinity is real, kill them here
    x_ref[:] = x
    part = jax.lax.dot_general(
        x, A,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (1, Ppad)
    row = i % 8
    ap_ref[pl.ds(row, 1), :] = ap_ref[pl.ds(row, 1), :] + part


@functools.partial(jax.jit, static_argnames=("unit_x", "interpret"))
def streaming_halfstep_pallas(fa_rows: jax.Array, fb_cols: jax.Array,
                              mask: jax.Array, u_pad: jax.Array, sw, pw, eps,
                              unit_x: bool = False, interpret: bool = False):
    """One phi-free Sinkhorn half-step over the rest-block pixels.

    fa_rows: (3, Ppad) sample features, transposed+padded (pad columns give
      garbage affinities annihilated by u's zero pad entries — and their
      garbage ap columns are sliced off by the caller).
    fb_cols: (3, Qpad) rest-pixel features, Qpad a TILE_Q multiple.
    mask: (1, Qpad) 1.0 on real pixels, 0.0 on pads.
    u_pad: (Ppad,) = Uinv @ t zero-padded.
    Returns (x (Qpad,), ap (Ppad,)) where x = mask * guarded-reciprocal
    (K_AB^T u) and ap = K_AB @ x. With unit_x=True, x = mask instead (the
    s0 = phi^T @ ones pass); u is ignored.
    """
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    cost = pl.CostEstimate(
        flops=2 * qpad * ppad * 6,
        bytes_accessed=4 * (qpad * 5 + 3 * ppad + 2 * ppad),
        transcendentals=qpad * ppad,
    )
    sw2, pw2, eps2, fa_rows, fb_cols, mask, u_row = _unify_vma(
        sw2, pw2, eps2, fa_rows, fb_cols, mask, u_pad[None, :])
    x, ap8 = pl.pallas_call(
        functools.partial(_halfstep_kernel, unit_x=unit_x),
        grid=(qpad // TILE_Q,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ppad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ppad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ppad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((1, qpad), u_row, fb_cols, mask, fa_rows),
            _out_struct((8, ppad), u_row, fb_cols, mask, fa_rows),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(sw2, pw2, eps2, u_row, fb_cols, mask, fa_rows)
    return x[0], jnp.sum(ap8, axis=0)


def _halfstep_ptiled_kernel(sw_ref, pw_ref, eps_ref, u_ref, fb_ref, mask_ref,
                            fa_ref, x_ref, ap_ref, wacc, *, np_tiles: int):
    """Two-pass variant for dense sampling grids (Ppad > MAX_STREAM_P_FUSED):
    the affinity tile is (TILE_Q, PTILE) — p no longer bounded by VMEM — at
    the price of recomputing it in both passes (2 exps per entry per sweep).
    Grid (q_tiles, 2, p_tiles): pass s=0 accumulates w = K_AB^T u over the
    p tiles and emits x = guarded-reciprocal(w) at the last tile; pass s=1
    re-generates each tile and accumulates ap = K_AB @ x.

    The ap accumulator is ONE (8, Ppad) block resident for the whole grid
    (constant index map, column slice selected by j) — per-j output blocks
    would be revisited at non-consecutive grid steps, which the TPU block
    pipeline does not guarantee to preserve."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (s == 0) & (j == 0))
    def _():
        ap_ref[:] = jnp.zeros_like(ap_ref)

    @pl.when(s == 0)
    def _():
        A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)  # (T, PTILE)

        @pl.when(j == 0)
        def _():
            wacc[:] = jnp.zeros_like(wacc)

        wacc[:] += jax.lax.dot_general(
            u_ref[:], A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (1, T)

        @pl.when(j == np_tiles - 1)
        def _():
            x = safe_reciprocal(wacc[:], eps_ref[0, 0])
            x_ref[:] = x * mask_ref[:]

    @pl.when(s == 1)
    def _():
        A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)
        part = jax.lax.dot_general(
            x_ref[:], A,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (1, PTILE)
        row = i % 8
        col = j * PTILE
        ap_ref[pl.ds(row, 1), pl.ds(col, PTILE)] = (
            ap_ref[pl.ds(row, 1), pl.ds(col, PTILE)] + part)


@functools.partial(jax.jit, static_argnames=("interpret",))
def streaming_halfstep_ptiled_pallas(fa_rows: jax.Array, fb_cols: jax.Array,
                                     mask: jax.Array, u_pad: jax.Array,
                                     sw, pw, eps, interpret: bool = False):
    """streaming_halfstep_pallas contract (unit_x excluded — see
    streaming_halfstep) for arbitrarily dense sampling grids: Ppad must be
    a PTILE multiple (see stream_p_alignment)."""
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    np_tiles = ppad // PTILE
    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    cost = pl.CostEstimate(
        flops=2 * 2 * qpad * ppad * 6,
        bytes_accessed=4 * (2 * qpad * 5 + 2 * 3 * ppad + 2 * ppad),
        transcendentals=2 * qpad * ppad,
    )
    sw2, pw2, eps2, fa_rows, fb_cols, mask, u_row = _unify_vma(
        sw2, pw2, eps2, fa_rows, fb_cols, mask, u_pad[None, :])
    x, ap8 = pl.pallas_call(
        functools.partial(_halfstep_ptiled_kernel, np_tiles=np_tiles),
        grid=(qpad // TILE_Q, 2, np_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, s, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, s, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, s, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, PTILE), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_Q), lambda i, s, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i, s, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PTILE), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_Q), lambda i, s, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ppad), lambda i, s, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((1, qpad), u_row, fb_cols, mask, fa_rows),
            _out_struct((8, ppad), u_row, fb_cols, mask, fa_rows),
        ),
        scratch_shapes=[pltpu.VMEM((1, TILE_Q), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(sw2, pw2, eps2, u_row, fb_cols, mask, fa_rows)
    return x[0], jnp.sum(ap8, axis=0)


def _ap_kernel(sw_ref, pw_ref, fb_ref, x_ref, fa_ref, ap_ref, *, pt: int,
               nrows: int):
    """ap = K_AB @ x over (q_tiles, p_tiles): one accumulation pass with no
    operand wider than the feature tiles (O(N) memory). Used for the s0 =
    phi^T @ ones pass (x = validity mask) and for the V-free factored
    apply's projection (x = c * y, one row per channel — the denoise path
    ships both chroma planes through a single sweep)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        ap_ref[:] = jnp.zeros_like(ap_ref)

    A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)      # (T, pt)
    part = jax.lax.dot_general(
        x_ref[:], A,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (R, pt)
    row = (i % 8) * nrows
    col = j * pt
    ap_ref[pl.ds(row, nrows), pl.ds(col, pt)] = (
        ap_ref[pl.ds(row, nrows), pl.ds(col, pt)] + part)


@functools.partial(jax.jit, static_argnames=("interpret",))
def streaming_ap_pallas(fa_rows: jax.Array, fb_cols: jax.Array,
                        x_row: jax.Array, sw, pw,
                        interpret: bool = False):
    """ap (R, Ppad) = K_AB @ x for x (R, Qpad), zero on pad columns. Works
    for any sampling-grid density (the sample dimension is tiled); R is
    the channel count (1 for the Sinkhorn s0 pass)."""
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    nrows = x_row.shape[0]
    pt = _ptile(ppad)
    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    cost = pl.CostEstimate(
        flops=2 * qpad * ppad * (5 + nrows),
        bytes_accessed=4 * (qpad * (3 + nrows) + 3 * ppad + 2 * nrows * ppad),
        transcendentals=qpad * ppad,
    )
    sw2, pw2, fa_rows, fb_cols, x_row = _unify_vma(
        sw2, pw2, fa_rows, fb_cols, x_row)
    ap8 = pl.pallas_call(
        functools.partial(_ap_kernel, pt=pt, nrows=nrows),
        grid=(qpad // TILE_Q, ppad // pt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_Q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, TILE_Q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * nrows, ppad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((8 * nrows, ppad), fb_cols, x_row, fa_rows),
        cost_estimate=cost,
        interpret=interpret,
    )(sw2, pw2, fb_cols, x_row, fa_rows)
    return jnp.sum(ap8.reshape(8, nrows, ppad), axis=0)


def _atb_kernel(sw_ref, pw_ref, fb_ref, b_ref, fa_ref, out_ref, *, pt: int):
    """out = K_AB^T @ b for R b rows (one per channel in the factored
    apply's tail): per q-tile accumulate over the p tiles. The output is an
    (R, Qpad) row block — a column output would be relayout-copied to 128
    padded lanes (512 B/pixel) at exactly the capacity sizes this path
    exists for."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)      # (T, pt)
    out_ref[:] += jax.lax.dot_general(
        b_ref[:], A,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (R, T)


@functools.partial(jax.jit, static_argnames=("interpret",))
def streaming_atb_pallas(fa_rows: jax.Array, fb_cols: jax.Array,
                         b_rows: jax.Array, sw, pw,
                         interpret: bool = False):
    """out (R, Qpad) = K_AB^T @ b for b (R, Ppad) (zero beyond the true p;
    also accepts a bare (Ppad,) vector, returning (1, Qpad)). Works for any
    sampling-grid density; every buffer is O(N) or O(p)."""
    if b_rows.ndim == 1:
        b_rows = b_rows[None, :]
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    nrows = b_rows.shape[0]
    pt = _ptile(ppad)
    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    cost = pl.CostEstimate(
        flops=2 * qpad * ppad * (5 + nrows),
        bytes_accessed=4 * (qpad * (3 + nrows) + 3 * ppad + nrows * ppad),
        transcendentals=qpad * ppad,
    )
    sw2, pw2, fa_rows, fb_cols, b_rows = _unify_vma(
        sw2, pw2, fa_rows, fb_cols, b_rows)
    out = pl.pallas_call(
        functools.partial(_atb_kernel, pt=pt),
        grid=(qpad // TILE_Q, ppad // pt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_Q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, pt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, TILE_Q), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((nrows, qpad), fb_cols, b_rows, fa_rows),
        cost_estimate=cost,
        interpret=interpret,
    )(sw2, pw2, fb_cols, b_rows, fa_rows)
    return out


def streaming_halfstep(fa_rows, fb_cols, mask, u_pad, sw, pw, eps,
                       unit_x=False, interpret=False):
    """Dispatch on the padded sample count: single-pass fused kernel while
    the whole (TILE_Q, Ppad) tile fits VMEM, two-pass p-tiled kernel
    beyond. The unit_x (s0 = phi^T @ ones) case on the p-tiled path has no
    reciprocal half, so it runs the one-pass ap kernel instead."""
    if fa_rows.shape[1] <= MAX_STREAM_P_FUSED:
        return streaming_halfstep_pallas(
            fa_rows, fb_cols, mask, u_pad, sw, pw, eps, unit_x=unit_x,
            interpret=interpret)
    if unit_x:
        ap = streaming_ap_pallas(fa_rows, fb_cols, mask, sw, pw,
                                 interpret=interpret)[0]
        return mask[0], ap
    return streaming_halfstep_ptiled_pallas(
        fa_rows, fb_cols, mask, u_pad, sw, pw, eps, interpret=interpret)


def _gram_kernel(sw_ref, pw_ref, uinv_ref, fb_ref, c_ref, fa_ref, sb_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sb_ref[:] = jnp.zeros_like(sb_ref)

    A = _affinity_tile(sw_ref, pw_ref, fb_ref, fa_ref)        # (T, Ppad)
    cphi = c_ref[:].T * jnp.dot(A, uinv_ref[:],
                                preferred_element_type=jnp.float32)  # (T, Mpad)
    sb_ref[:] += jax.lax.dot_general(
        cphi, cphi,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def streaming_scaled_gram_pallas(fa_rows: jax.Array, fb_cols: jax.Array,
                                 c_row: jax.Array, uinv_pad: jax.Array,
                                 sw, pw, interpret: bool = False):
    """Sb = (c * phi_rest)^T (c * phi_rest) over the streamed rest block,
    with phi_rest = K_AB^T @ Uinv recomputed tile by tile.

    c_row: (1, Qpad), zero on pad columns (zeroed pixels contribute
    nothing). uinv_pad: (Ppad, Mpad). Returns (Mpad, Mpad); caller slices
    [:m, :m].
    """
    qpad = fb_cols.shape[1]
    ppad, mpad = uinv_pad.shape
    sw2 = jnp.asarray(sw, jnp.float32).reshape(1, 1)
    pw2 = jnp.asarray(pw, jnp.float32).reshape(1, 1)
    cost = pl.CostEstimate(
        flops=2 * qpad * ppad * (mpad + 4) + 2 * qpad * mpad * mpad,
        bytes_accessed=4 * (qpad * 4 + 3 * ppad + ppad * mpad + mpad * mpad),
        transcendentals=qpad * ppad,
    )
    sw2, pw2, uinv_pad, fb_cols, c_row, fa_rows = _unify_vma(
        sw2, pw2, uinv_pad, fb_cols, c_row, fa_rows)
    sb = pl.pallas_call(
        _gram_kernel,
        grid=(qpad // TILE_Q,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ppad, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ppad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mpad, mpad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((mpad, mpad), uinv_pad, fb_cols, c_row, fa_rows),
        cost_estimate=cost,
        interpret=interpret,
    )(sw2, pw2, uinv_pad, fb_cols, c_row, fa_rows)
    return sb


def streaming_scaled_gram_xla(fa: jax.Array, fb_cols: jax.Array,
                              c_row: jax.Array, uinv: jax.Array, sw, pw,
                              tile: int = 8192):
    """XLA fallback for streaming_scaled_gram_pallas when (Ppad, Mpad) Uinv
    or the (Mpad, Mpad) Sb no longer fit VMEM (dense sampling grids): a
    lax.scan over row tiles accumulates Sb with only one (tile, p) affinity
    block + one (tile, m) cphi block alive in HBM at a time — memory stays
    O(N + p*m). This runs once per train (vs 2*n_iter+1 halfstep sweeps),
    so the XLA-vs-Pallas rate difference is immaterial.

    fb_cols/c_row follow pad_stream_operands (c zero on pad columns); uinv
    is the UNPADDED (p, m) factor. Returns (m, m)."""
    from nle_tpu.ops.affinity import affinity_block

    qpad = fb_cols.shape[1]
    m = uinv.shape[1]
    tile = min(tile, qpad)
    while qpad % tile:
        tile //= 2
    nt = qpad // tile

    def body(Sb, inp):
        fb_t, c_t = inp                                  # (3, tile), (tile,)
        k = affinity_block(fb_t.T, fa, sw, pw)           # (tile, p)
        cphi = c_t[:, None] * jnp.dot(k, uinv,
                                      preferred_element_type=jnp.float32)
        return Sb + jax.lax.dot_general(
            cphi, cphi,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), None

    Sb, _ = jax.lax.scan(
        body, jnp.zeros((m, m), jnp.float32),
        (fb_cols.reshape(3, nt, tile).transpose(1, 0, 2),
         c_row[0].reshape(nt, tile)))
    return Sb


def gram_fits_vmem(p: int, m: int) -> bool:
    """Whether streaming_scaled_gram_pallas's working set — whole
    (Ppad, Mpad) Uinv + (Mpad, Mpad) Sb + a (TILE_Q, Ppad) affinity tile +
    the (TILE_Q, Mpad) cphi block — fits VMEM."""
    ppad = _round_up(p, stream_p_alignment(p))
    mpad = _round_up(m, 128)
    return 4 * (TILE_Q * ppad + ppad * mpad + mpad * mpad
                + TILE_Q * mpad) <= 10 * 2**20


def streaming_sinkhorn_vectors(fa: jax.Array, fb: jax.Array, Um: jax.Array,
                               lam_m: jax.Array, Uinv: jax.Array,
                               max_iter: int, eps: float, sw, pw,
                               interpret: bool = False):
    """Sinkhorn balancing without materializing phi: returns (r, c) each
    (N,) in packed [selected; rest] order for N = p + fb.shape[0].

    The p sampled rows of phi are Um (tiny, handled in XLA); the rest-block
    rows are recomputed from affinities every half-step by
    `streaming_halfstep`.
    """
    p, m = Um.shape
    q = fb.shape[0]
    fa_rows, fb_cols, mask = pad_stream_operands(fa, fb)
    qpad = fb_cols.shape[1]
    ppad = fa_rows.shape[1]
    lam = lam_m.astype(jnp.float32)
    Um32 = Um.astype(jnp.float32)
    Uinv32 = Uinv.astype(jnp.float32)

    def halfstep(t):
        u = Uinv32 @ t                                        # (p,)
        u_pad = jnp.pad(u, (0, ppad - p))
        x_top = safe_reciprocal(Um32 @ t, eps)                # (p,)
        x_rest, ap = streaming_halfstep(
            fa_rows, fb_cols, mask, u_pad, sw, pw, eps, interpret=interpret)
        s = Um32.T @ x_top + Uinv32.T @ ap[:p]
        return x_top, x_rest, s

    # s0 = phi^T @ ones: Um columns + one unit_x streaming pass.
    _, ap0 = streaming_halfstep(
        fa_rows, fb_cols, mask, jnp.zeros((ppad,), jnp.float32), sw, pw, eps,
        unit_x=True, interpret=interpret)
    s0 = jnp.sum(Um32, axis=0) + Uinv32.T @ ap0[:p]

    zero_top = jnp.zeros((p,), jnp.float32)
    zero_rest = jnp.zeros((qpad,), jnp.float32)

    def body(_, state):
        _, _, _, _, s = state
        c_top, c_rest, s = halfstep(lam * s)
        r_top, r_rest, s = halfstep(lam * s)
        return r_top, r_rest, c_top, c_rest, s

    r_top, r_rest, c_top, c_rest, _ = jax.lax.fori_loop(
        0, max_iter, body, (jnp.ones((p,), jnp.float32), zero_rest + 1.0,
                            zero_top, zero_rest, s0))
    r = jnp.concatenate([r_top, r_rest[:q]])
    c = jnp.concatenate([c_top, c_rest[:q]])
    return r, c
