"""Fused Sinkhorn half-step Pallas TPU kernel.

One balancing half-step needs, for t = lam * (phi^T x_prev):
    x = 1 / (phi @ t)        (eps-guarded reciprocal, N-vector)
    s = phi^T @ x            (m-vector, feeds the next half-step)
Done naively that is two full sweeps of phi (N, m) per half-step — four per
Sinkhorn iteration, and phi traffic is the throughput ceiling of the whole
enhance pipeline (reference hot loop #3, src/filter.cpp:238-245).

This kernel fuses the reciprocal and the next reduction into the same sweep:
for each row tile, w = phi_tile @ t is formed on the MXU, the guarded
reciprocal on the VPU, and the partial s_i = phi_tile^T x_tile contracted
back on the MXU while the tile is still in VMEM. Each half-step thus reads
phi exactly once — 2 sweeps per iteration instead of 4, doubling Sinkhorn
throughput at the HBM-bandwidth limit.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nle_tpu.ops.linalg import safe_reciprocal
from nle_tpu.ops.pallas.affinity_kernel import _out_struct, _unify_vma

TILE_N = 1024


from nle_tpu.ops.pallas._common import round_up as _round_up


def padded_shape(n: int, m: int, tile: int = TILE_N) -> tuple[int, int]:
    """The (rows, cols) layout the fused kernels expect phi in — callers
    that pre-assemble phi padded must use exactly this rule. Rows round to
    2*tile so the bf16 Sinkhorn iterations can stream double-size chunks
    (the measured DMA sweet spot for 2-byte elements)."""
    return _round_up(max(n, 1), 2 * tile), _round_up(max(m, 1), 128)


def _kernel(eps_ref, t_ref, phi_ref, x_ref, s_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)

    # w = phi @ t without materializing a transposed t: contract (T, M) with
    # (1, M) over M.
    w = jax.lax.dot_general(
        phi_ref[:], t_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (T, 1)
    x = safe_reciprocal(w, eps_ref[0, 0])
    x_ref[:] = x
    # s = x^T phi: contract (T, 1) with (T, M) over T; accumulate into the
    # persistent (8, M) output block (constant index_map keeps it resident
    # in VMEM across the sequential grid), striping rows for a tiny
    # pairwise-summation benefit.
    part = jax.lax.dot_general(
        x, phi_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (1, M)
    row = i % 8
    s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + part


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def sinkhorn_halfstep_pallas(phi_pad: jax.Array, t: jax.Array, eps,
                             interpret: bool = False, tile: int = TILE_N):
    """x = guarded-reciprocal(phi @ t); s = phi^T x — one sweep of phi.

    phi_pad: (Npad, Mpad) float32, rows beyond the true N and columns beyond
    the true m zero-padded (zero rows produce w = 0 -> x = 0 -> contribute
    nothing to s; zero columns produce s entries that are sliced off by the
    caller). Npad must be a TILE_N multiple, Mpad a 128 multiple.
    t: (Mpad,) float32. Returns (x (Npad,), s (Mpad,)).
    """
    npad, mpad = phi_pad.shape
    if npad % tile or mpad % 128:
        # Same loud guard as the manual twin: a non-multiple would make the
        # grid silently SKIP the tail rows (uninitialized x, missing s
        # contributions). Zero-pad with padded_shape first.
        raise ValueError(
            f"phi_pad {phi_pad.shape} must be (k*{tile}, j*128) — use "
            "padded_shape()")
    grid = (npad // tile,)
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    x, s_parts = pl.pallas_call(
        _kernel,
        grid=grid,
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
        cost_estimate=pl.CostEstimate(
            flops=4 * npad * mpad,
            bytes_accessed=4 * (npad * mpad + npad + 2 * mpad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(eps2, t[None, :], phi_pad)
    return x[:, 0], jnp.sum(s_parts, axis=0)


def _kernel_manual(eps_ref, t_ref, phi_hbm, x_hbm, s_ref, buf, xbuf, sems,
                   xsems, *, chunk: int, nchunks: int):
    """Manually double-buffered halfstep: phi chunks are DMA'd HBM->VMEM in
    two revolving slots while the previous chunk computes; x rows are DMA'd
    back out through two revolving (1, chunk) slots. The automatic block
    pipeline reaches only ~50% of HBM bandwidth for this streaming GEMV
    shape; the manual pipeline does substantially better. The x vector is
    handled in ROW layout ((1, chunk) tiles of an (nchunks, chunk) array) so
    every DMA slice is lane-aligned."""

    def phi_dma(slot, idx):
        return pltpu.make_async_copy(
            phi_hbm.at[pl.ds(idx * chunk, chunk), :], buf.at[slot], sems.at[slot]
        )

    def x_dma(slot, idx):
        # xbuf slots are (8, chunk) for VMEM sublane alignment; only row 0
        # carries data. 8x on the x write-back is ~1% of the phi read.
        return pltpu.make_async_copy(
            xbuf.at[slot], x_hbm.at[idx], xsems.at[slot]
        )

    s_ref[:] = jnp.zeros_like(s_ref)
    phi_dma(0, 0).start()

    # bf16 chunks must contract at DEFAULT precision: callers run under
    # default_matmul_precision("highest"), and Mosaic rejects an fp32
    # contract precision on bf16 operands ("Bad lhs type"). The native bf16
    # MXU pass with f32 accumulation is exactly what we want here anyway.
    prec = (jax.lax.Precision.DEFAULT
            if buf.dtype == jnp.bfloat16 else None)

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < nchunks)
        def _():
            phi_dma((i + 1) % 2, i + 1).start()

        phi_dma(slot, i).wait()
        phi = buf[slot]
        if phi.dtype == jnp.int32:
            # int16 PAIR-PACKED stream (see sinkhorn_vectors_fused): each
            # 32-bit word carries two per-column-scaled int16 values —
            # logical row r in the low half, row r + N/2 in the high half.
            # The container is int32 so XLA stores it plain-T(8,128)-tiled
            # like f32 (a bare s16 buffer gets the (2,1) pair-packed
            # tiling, which forfeits the narrow-width DMA win).
            #
            # MXU precision is the load-bearing subtlety here. Callers
            # trace under default_matmul_precision("highest"), and on f32
            # operands "highest" is SIX bf16 MXU passes — in situ that
            # pass-wall (~4.0 ms/halfstep at the 1 MP shape) sits ABOVE
            # both carriers' DMA times (f32 3.4, packed 1.7), which is
            # what masked the byte win in every earlier in-situ test (the
            # isolated benches traced outside the ambient precision and
            # unknowingly measured 1-pass dots). Mosaic lowers only
            # DEFAULT and HIGHEST, so the 3-pass fix is built by hand:
            # each unpacked value v (a <= 15-bit integer, exact in f32)
            # splits EXACTLY as v = (v >> 7) * 128 + (v & 127) with both
            # pieces exactly representable in bf16, and the f32 t/x side
            # splits into bf16 hi + lo (|lo| <= |t| * 2^-9). Keeping the
            # h*h, h*l, l*h terms and dropping only l*l leaves a relative
            # error ~2^-17 — below the 2^-16 quantization the carrier
            # already accepts — while every dot is a native single-pass
            # bf16 MXU op (f32 accumulation): ~8 half-size bf16 streams
            # per halfstep vs "highest"'s 24, putting the MXU back under
            # the DMA roofline.
            dprec = jax.lax.Precision.DEFAULT
            lo16 = (phi << 16) >> 16                       # sign-extended
            hi16 = phi >> 16                               # arithmetic
            lo_h = (lo16 >> 7).astype(jnp.bfloat16)        # [-256, 255]
            lo_l = (lo16 & 127).astype(jnp.bfloat16)       # [0, 127]
            hi_h = (hi16 >> 7).astype(jnp.bfloat16)
            hi_l = (hi16 & 127).astype(jnp.bfloat16)
            t32 = t_ref[:]
            t_h = t32.astype(jnp.bfloat16)
            t_l = (t32 - t_h.astype(jnp.float32)).astype(jnp.bfloat16)
            t2 = jnp.concatenate([t_h, t_l], axis=0)       # (2, M)

            def w_of(v_h, v_l):
                # t . v = ((t_h + t_l) . v_h) * 128 + t_h . v_l  (l*l dropped)
                wh = jax.lax.dot_general(
                    t2, v_h, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dprec)                       # (2, chunk)
                wl = jax.lax.dot_general(
                    t_h, v_l, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dprec)                       # (1, chunk)
                return (wh[0:1, :] + wh[1:2, :]) * 128.0 + wl

            w_lo = w_of(lo_h, lo_l)
            w_hi = w_of(hi_h, hi_l)
            x_lo = safe_reciprocal(w_lo, eps_ref[0, 0])
            x_hi = safe_reciprocal(w_hi, eps_ref[0, 0])

            @pl.when(i >= 2)
            def _():
                x_dma(slot, i - 2).wait()

            # One (8, 2*chunk) write-back slot: low-half rows then
            # high-half rows; the caller splits and reorders (cheap).
            xbuf[slot, 0:1, 0:w_lo.shape[1]] = x_lo
            xbuf[slot, 0:1, w_lo.shape[1]:] = x_hi
            x_dma(slot, i).start()

            def s_of(x, v_h, v_l):
                # x . v = ((x_h + x_l) . v_h) * 128 + x_h . v_l
                x_h = x.astype(jnp.bfloat16)
                x_l = (x - x_h.astype(jnp.float32)).astype(jnp.bfloat16)
                x2 = jnp.concatenate([x_h, x_l], axis=0)   # (2, chunk)
                ph = jnp.dot(x2, v_h, preferred_element_type=jnp.float32,
                             precision=dprec)              # (2, M)
                pll = jnp.dot(x_h, v_l, preferred_element_type=jnp.float32,
                              precision=dprec)             # (1, M)
                return (ph[0:1, :] + ph[1:2, :]) * 128.0 + pll

            part = s_of(x_lo, lo_h, lo_l) + s_of(x_hi, hi_h, hi_l)
            row = i % 8
            s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + part
            return 0
        # w as a ROW: contract t (1, M) with phi (chunk, M) over M -> (1, chunk)
        w = jax.lax.dot_general(
            t_ref[:], phi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        x = safe_reciprocal(w, eps_ref[0, 0])

        @pl.when(i >= 2)
        def _():
            x_dma(slot, i - 2).wait()

        xbuf[slot, 0:1, :] = x
        x_dma(slot, i).start()
        # s partial: x (1, chunk) @ phi (chunk, M) -> (1, M). For the bf16
        # phi copy, x is cast to match so the MXU runs a native bf16 pass
        # (f32 accumulation); the rounding this adds is polished away by the
        # trailing f32 iterations (see sinkhorn_vectors_fused).
        part = jnp.dot(x.astype(phi.dtype), phi,
                       preferred_element_type=jnp.float32, precision=prec)
        row = i % 8
        s_ref[pl.ds(row, 1), :] = s_ref[pl.ds(row, 1), :] + part
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    # Drain the in-flight x write-backs.
    @pl.when(nchunks >= 2)
    def _():
        x_dma((nchunks - 2) % 2, nchunks - 2).wait()

    x_dma((nchunks - 1) % 2, nchunks - 1).wait()


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def sinkhorn_halfstep_manual(phi_pad: jax.Array, t: jax.Array, eps,
                             chunk: int = 1024, interpret: bool = False):
    """Manual-DMA variant of sinkhorn_halfstep_pallas (same contract:
    returns (x (npad,), s (mpad,))).

    phi_pad may be float32, bfloat16, or int32 (the PAIR-PACKED int16
    stream: word (r, c) holds logical row r in its low 16 bits and row
    r + N/2 in its high 16 bits — see sinkhorn_vectors_fused; the int32
    container keeps the buffer plain-T(8,128)-tiled so the DMA realizes
    the narrow width). With bf16 or packed-int16 the DMA stream — the
    throughput ceiling of the whole pipeline — moves half the bytes.
    x and s stay float32 in every mode; for packed input `chunk` counts
    PACKED rows (the logical x returned has 2*npad entries)."""
    npad, mpad = phi_pad.shape
    packed = phi_pad.dtype == jnp.int32
    if npad % chunk != 0:
        # nchunks = npad // chunk would silently DROP the tail rows (absent
        # x entries, missing s contributions) — fail loudly instead. The
        # internal caller (sinkhorn_vectors_fused) always pads to a chunk
        # multiple; this guards direct callers.
        raise ValueError(
            f"phi rows ({npad}) must be a multiple of chunk ({chunk})")
    nchunks = npad // chunk
    xw = 2 * chunk if packed else chunk
    eps2 = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    # bf16 phi contracts natively against a bf16 t; the packed-int16
    # stream is unpacked to f32 in-kernel, so t (and x) stay f32.
    t_row = (t[None, :].astype(phi_pad.dtype)
             if phi_pad.dtype == jnp.bfloat16 else t[None, :])
    # vma uniformity under shard_map(check_vma=True): the sharded dense
    # trainer calls this per pixel shard with a 'pixel'-varying phi block
    # against replicated scalars/t (parallel/sharded.py _train_2a_q);
    # pcast + annotated out structs are no-ops single-chip.
    eps2, t_row, phi_pad = _unify_vma(eps2, t_row, phi_pad)
    x, s8 = pl.pallas_call(
        functools.partial(_kernel_manual, chunk=chunk, nchunks=nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((nchunks, 8, xw), eps2, t_row, phi_pad),
            _out_struct((8, mpad), eps2, t_row, phi_pad),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, mpad), phi_pad.dtype),
            pltpu.VMEM((2, 8, xw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(eps2, t_row, phi_pad)
    if packed:
        # Chunk i's slot row 0 is [x_lo(chunk), x_hi(chunk)]: logical rows
        # [i*chunk, (i+1)*chunk) and [npad + i*chunk, ...). Reassemble the
        # (2*npad,) vector — an 8*npad-byte shuffle per halfstep, ~0.6% of
        # the phi sweep it rides on.
        return (jnp.concatenate([x[:, 0, :chunk].reshape(npad),
                                 x[:, 0, chunk:].reshape(npad)]),
                jnp.sum(s8, axis=0))
    return x[:, 0, :].reshape(npad), jnp.sum(s8, axis=0)


def _resolve_bf16_iters(max_iter: int, bf16_iters: int | None) -> int:
    """How many leading iterations run on the bf16 phi copy.

    DEFAULT IS OFF. The bf16 trajectory carries ~1e-3 relative error into
    (r, c) even after f32 polish iterations, and the downstream
    orthogonalization chain amplifies that chaotically on some scenes
    (measured: bird 59->27 dB, rock2 62->24 dB golden PSNR — fails the
    45 dB gate). No polish length fixes this: the Sinkhorn map's
    contraction factor on these kernels is ~0.94/iteration (measured decay
    of an injected bf16 lead error on the rock2 grid: 1.7e-4 after 1 f32
    polish iteration, still 3.8e-5 after 24), so erasing the perturbation
    within the reference's fixed 50-iteration budget is impossible — the
    reference trajectory is NOT converged, and golden parity pins the
    trajectory, not the fixed point. It remains available as an explicit
    fast/preview mode: ~1.8x on the dominant HBM-bound stage.

    Precedence (one consistent rule: an EXPLICITLY SET env var is the
    operator's override and always wins; an unset env defers to the
    caller's argument):
      - env unset (default: off): the `bf16_iters` argument decides
        (None -> 0).
      - env "off"/"0"/"false": authoritative 0 — the operator can kill
        the fidelity-risky mode regardless of code paths passing
        bf16_iters.
      - env integer: authoritative count.
      - env "auto"/"on": argument wins if given, else all but the last 2
        iterations (needs >= 2 bf16 iterations to amortize the copy).
      - env "all": every iteration bf16, no polish (A/B tests).
    """
    raw = os.environ.get("NLE_SINKHORN_BF16")
    arg = 0 if bf16_iters is None else max(0, min(max_iter, bf16_iters))
    if raw is None:
        return arg
    env = raw.lower()
    if env in ("off", "0", "false"):
        return 0
    if env == "all":
        return max_iter
    if env not in ("auto", "on", "1", "true"):
        try:
            return max(0, min(max_iter, int(env)))
        except ValueError:
            raise ValueError(
                f"NLE_SINKHORN_BF16={env!r}: expected off/auto/all or an "
                "integer iteration count") from None
    if bf16_iters is not None:
        return arg
    lead = max_iter - 2
    return lead if lead >= 2 else 0


def _resolve_int16(n_bf16: int) -> bool:
    """Whether the f32 iterations stream an int16 PER-COLUMN-SCALED copy
    of phi instead of the f32 buffer. DEFAULT ON (auto): 2.1x faster on
    the pipeline's dominant stage and golden-gated on the real chip.

    The algebra: the scale factors out of both contractions EXACTLY —

        phi ~ Q diag(s),  s_j = colmax_j / 32767
        w   = phi (lam * (phi^T x)) = Q ((lam s^2) * (Q^T x))

    so the kernel streams int16 (half the f32 bytes on the pipeline's
    dominant HBM-bound stage), pair-packed into an int32 container (two
    logical rows per word — keeps plain T(8,128) tiling; a bare s16
    buffer gets XLA's (2,1) packed tiling which forfeits the narrow-DMA
    win), and the column scale merges into lam as lam*s^2 with the
    running s-vector kept in Q-scale. Error sources: the copy's
    quantization (<= colmax * 2^-16 per element) plus the in-kernel
    bf16-split dots' dropped lo*lo cross-term (~2^-17 — see
    _kernel_manual; Mosaic lowers only DEFAULT/HIGHEST, so the 3-pass
    equivalent of Precision.HIGH is built by hand from exact bf16
    pieces).

    Why it IS the default (the round-3 measurement saga, in full in
    DESIGN.md): the first two in-situ attempts ran at exactly f32 wall
    (~4.0 ms/halfstep at the 1 MP p=600 shape) and the mode was
    initially resolved OFF. The bisection (tools/bench_stage2a_bisect.py
    + HLO diffs) showed the while bodies of the fast isolated harness
    and the slow real stage are IDENTICAL — the spoiler was the ambient
    jax.default_matmul_precision("highest") the real stage traces
    under: on f32 operands "highest" is SIX bf16 MXU passes, an
    MXU-pass wall (~4.0 ms) ABOVE both carriers' DMA times (f32 3.4,
    packed 1.7), so byte width could not matter. With the in-kernel
    bf16-split dots (single-pass, analytically below the quantization
    error) the real stage runs 1.92 ms/halfstep vs f32's 4.0
    (tools/bench_stage2a_slope.py, real chip) — near the packed-DMA
    floor. Golden-gated at the new trajectory on the REAL chip: all 16
    configs pass, worst 51.6 dB (paper) vs the 45 dB gate, mean 60.1
    (GOLDEN_TPU.jsonl). NLE_SINKHORN_INT16=off restores the zero-
    quantization f32 stream.

    Orthogonal to the bf16 preview mode: int16 engages only when no
    bf16 lead is scheduled (the bf16 schedule's trailing iterations are
    a POLISH and stay f32). Read at trace time like the other Sinkhorn
    knobs."""
    raw = os.environ.get("NLE_SINKHORN_INT16", "auto").lower()
    if raw in ("off", "0", "false"):
        return False
    if raw not in ("auto", "on", "1", "true"):
        raise ValueError(
            f"NLE_SINKHORN_INT16={raw!r}: expected auto/on/off")
    return n_bf16 == 0


def quantize_int16(phi_pad: jax.Array):
    """Per-COLUMN int16 quantization of an f32 phi block (the carrier's
    load-bearing axis choice: phi columns carry the Nystrom 1/lam factor
    spanning ~10 decades, so a per-ROW scale is catastrophic — 4.8 dB on
    bird — while per-column is essentially free; see _resolve_int16).
    Returns (qf, scale, colmax): qf is the rounded value in [-32767, 32767]
    kept in FLOAT32 (exact — integers <= 32767), scale (cols,) with 1.0 on
    all-zero columns, colmax (cols,). phi ~ unquantize: qf * scale."""
    colmax = jnp.max(jnp.abs(phi_pad), axis=0)
    scale = jnp.where(colmax > 0, colmax / 32767.0, 1.0)
    qf = jnp.clip(jnp.round(phi_pad / scale[None, :]), -32767, 32767)
    return qf, scale, colmax


def pack_pairs_int32(qf: jax.Array) -> jax.Array:
    """PAIR-PACK quantized rows into an int32 container: word (r, c)
    carries logical row r in its low 16 bits and row r + npad/2 in its
    high 16 bits. The int32 container keeps plain T(8,128) tiling — a bare
    s16 buffer gets XLA's (2,1) packed 16-bit tiling, which forfeits the
    narrow-DMA win (round-3 measurement, DESIGN.md). Rows must be even."""
    nh = qf.shape[0] // 2
    return (jnp.bitwise_and(qf[:nh].astype(jnp.int32), 0xFFFF)
            | (qf[nh:].astype(jnp.int32) << 16))


def quantize_pack_int16(phi_pad: jax.Array):
    """quantize_int16 + pack_pairs_int32 in one fused elementwise chain —
    the ONE-pass prep form: each phi half is read once and the
    quantize/round/clip/cast/shift feeds the packed write directly, so
    the f32 qf intermediate never hits HBM. The two-function form
    materialized qf (2.56 GB written AND re-read at the 1 MP shape —
    measured ~12 ms of the 19 ms prep, tools/profile_stage2a_parts.py)
    because the pack's two half-slices make XLA keep the producer.
    Arithmetic is IDENTICAL (same round/clip/cast ops), so the
    trajectory is bit-equal to the unfused form. Returns (q32, scale,
    colmax); rows must be even."""
    colmax = jnp.max(jnp.abs(phi_pad), axis=0)
    scale = jnp.where(colmax > 0, colmax / 32767.0, 1.0)
    nh = phi_pad.shape[0] // 2

    def q(x):
        return jnp.clip(jnp.round(x / scale[None, :]),
                        -32767, 32767).astype(jnp.int32)

    q32 = jnp.bitwise_and(q(phi_pad[:nh]), 0xFFFF) | (q(phi_pad[nh:]) << 16)
    return q32, scale, colmax


def carrier_crush_frac(phi_pad: jax.Array, scale: jax.Array) -> jax.Array:
    """Fraction of NONZERO phi entries the int16 carrier crushes to 0 —
    the runtime validity statistic for the quantized trajectory (VERDICT
    r4 #2). An entry quantizes to zero iff |phi_ij| < scale_j/2; a column
    that packs many decades of dynamic range (the documented failure
    domain: uniform noise at small hx, ROADMAP r4 carrier note) crushes
    most of its mass and the balancing weights of the affected rows
    collapse through safe_reciprocal. Measured separation
    (tools/exp_carrier_domain.py, f64 oracle with the carrier
    substituted): all 10 README configs <= 0.09 crushed and 80-100 dB vs
    the f64 trajectory; uniform noise at hx<=10 >= 0.32 crushed and
    4.6-6.1 dB (destroyed). The VERDICT-suggested per-column
    min-nonzero/max ratio does NOT separate (0.0 for both populations —
    real affinity tails reach arbitrarily small values too).

    Pure observation: reads phi beside the quantizer's own sweep (XLA
    fuses the reduces), never perturbs the carrier arithmetic. Zero pad
    rows/columns are exact zeros and drop out of both counts."""
    num, den = crush_counts(phi_pad, scale)
    return num / jnp.maximum(den, 1.0)


def crush_counts(phi, scale):
    """(crushed, nonzero) counts as f32 scalars — the ONE definition of
    the crush predicate, shared by carrier_crush_frac and the sharded
    trainer (which psums the two counts across pixel shards before
    dividing, parallel/sharded.py _train_2a_q)."""
    nz = phi != 0
    num = jnp.sum(
        jnp.logical_and(jnp.abs(phi) < 0.5 * scale[None, :], nz),
        dtype=jnp.float32)
    return num, jnp.sum(nz, dtype=jnp.float32)


def carrier_guard_decision(crush: float, log, context: str,
                           action: str) -> bool:
    """The ONE guard policy, shared by the single-chip and sharded hosts
    (check_carrier_guard / _sharded_guard_trips): over the
    NLE_INT16_GUARD threshold -> warn + True (caller retrains f32)
    unless the operator EXPLICITLY forced the carrier on (warn + False —
    override wins). `context` labels the statistic in the message (e.g.
    "crush fraction" / "worst crush"); `action` describes the fallback
    (e.g. "retraining" / "retraining this group")."""
    threshold = resolve_int16_guard()
    if threshold is None or not crush > threshold:
        return False
    if int16_forced_on():
        log.warning(
            "int16 Sinkhorn carrier out of its validity domain (%s %.3f "
            "> %.3f) but NLE_SINKHORN_INT16 is forced on — continuing "
            "with the quantized trajectory; expect degraded output on "
            "this input.", context, crush, threshold)
        return False
    log.warning(
        "int16 Sinkhorn carrier out of its validity domain (%s %.3f > "
        "%.3f: this input packs more dynamic range into phi columns than "
        "int16's ~4.5 decades): %s through the f32 carrier. "
        "NLE_INT16_GUARD tunes/disables this guard.",
        context, crush, threshold, action)
    return True


def resolve_int16_guard() -> float | None:
    """Threshold for the carrier crush-fraction guard, or None when
    disabled. NLE_INT16_GUARD: "off" disables, a float overrides; default
    0.2 — the geometric middle of the measured gap (real configs <= 0.09,
    failure domain >= 0.32, tools/exp_carrier_domain.py). Read by the
    HOST-side guard at call time (the statistic is computed in-jit and
    rides the rc fetch; the fallback is a host re-dispatch through the
    bit-pinned f32 path, so the default trajectory's program is
    untouched)."""
    raw = os.environ.get("NLE_INT16_GUARD", "0.2").lower()
    if raw in ("off", "false", "none"):
        return None
    try:
        val = float(raw)
    except ValueError:
        raise ValueError(
            f"NLE_INT16_GUARD={raw!r}: expected off or a float threshold"
        ) from None
    if not 0.0 < val <= 1.0:
        raise ValueError(
            f"NLE_INT16_GUARD={val}: threshold must be in (0, 1]")
    return val


def int16_forced_on() -> bool:
    """Whether the operator EXPLICITLY forced the int16 carrier on
    (NLE_SINKHORN_INT16=on/1/true, not the default auto). The guard then
    warns but does not fall back — an explicit operator override wins,
    same precedence rule as every Sinkhorn knob."""
    return os.environ.get(
        "NLE_SINKHORN_INT16", "auto").lower() in ("on", "1", "true")


def sinkhorn_halfstep_split_xla(qi: jax.Array, tq: jax.Array, eps):
    """Plain-XLA twin of _kernel_manual's packed-int16 branch for non-TPU
    meshes (interpret-mode pallas inside shard_map trips check_vma on the
    replicated SMEM scalars — same reason the streaming sharded path has
    an XLA body, parallel/sharded.py _train_2a_streaming). Reproduces the
    kernel's EXACT split arithmetic — v = (v >> 7) * 128 + (v & 127) with
    both pieces exact in bf16, t/x split into bf16 hi + lo, the l*l term
    dropped — so CPU-mesh tests certify the quantized trajectory's error
    class off-chip (accumulation order differs from the MXU; not bitwise).

    qi: (n, m) int32 quantized values in [-32767, 32767] (UNPACKED).
    tq: (m,) f32 in Q-scale (caller applies the column scale).
    Returns (x (n,), s_q (m,)) with s_q = Q^T x in Q-scale."""
    dprec = jax.lax.Precision.DEFAULT
    v_h = (qi >> 7).astype(jnp.bfloat16)           # [-256, 255]
    v_l = (qi & 127).astype(jnp.bfloat16)          # [0, 127]
    t_h = tq.astype(jnp.bfloat16)
    t_l = (tq - t_h.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot_vm(vec, mat):     # (m,) bf16 . (n, m) bf16 -> (n,) f32
        return jax.lax.dot_general(
            mat, vec, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)

    w = (dot_vm(t_h, v_h) + dot_vm(t_l, v_h)) * 128.0 + dot_vm(t_h, v_l)
    x = safe_reciprocal(w, eps)
    x_h = x.astype(jnp.bfloat16)
    x_l = (x - x_h.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot_nv(vec, mat):     # (n,) bf16 . (n, m) bf16 -> (m,) f32
        return jax.lax.dot_general(
            vec, mat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dprec)

    s_q = (dot_nv(x_h, v_h) + dot_nv(x_l, v_h)) * 128.0 + dot_nv(x_h, v_l)
    return x, s_q


def split_row_pad(nb: int, mb: int, tile: int = TILE_N) -> tuple[int, int]:
    """Row padding of the REST block in the split-buffer stage 2a: the
    same VMEM-shrunk tile rule as sinkhorn_vectors_fused, doubled for the
    pair-packed stream. Returns (npad_b, t_eff): the padded rest-row
    count AND the effective (possibly VMEM-shrunk) tile it was rounded
    to — sinkhorn_vectors_split re-derives t_eff from the same rule and
    validates npad_b against it. Static (callers size the affinity
    builder's direct-write output with it before anything traces)."""
    mpad = _round_up(max(mb, 1), 128)
    t = tile
    while t > 256 and 2 * t * mpad * 4 > 12 * 2**20:
        t //= 2
    return _round_up(max(nb, 1), 2 * t), t


def resolve_split_stage2(max_iter: int) -> bool:
    """Whether stage 2a takes the SPLIT-BUFFER layout: Um and the rest
    block phi_b are never concatenated — the affinity builder writes the
    zero-tailed padded rest block directly and the Sinkhorn loop carries
    the top block as p-sized XLA matvecs beside the packed-int16 rest
    stream (sinkhorn_vectors_split). Engages exactly when the int16
    carrier would (manual kernel, no bf16 lead, NLE_SINKHORN_INT16 not
    off): the assembled-buffer f32/bf16 modes keep their bit-pinned
    trajectories (tools/check_tpu_sharded.py's =off machinery baseline).
    Motivation: the zeros+DUS assembly of [Um; phi_b] measured ~35 ms of
    pure copy at the 1 MP serving shape (tools/profile_stage2a_parts.py,
    r4). NLE_STAGE2_SPLIT overrides for A/B runs: auto (default — follow
    the int16 resolve), off (assembled layout even with int16 on), on
    (assert the split layout engages — ERRORS if the int16 carrier does
    not resolve, since the split layout cannot run without it; a silent
    fallback would void the very A/B the knob exists for). Carve-out
    =on cannot police: this resolve sees only the env/carrier state, not
    the image — train_filter_stage2a still takes the small/XLA path when
    stage2_dense_small(n, mb) holds or the fused kernels are unavailable
    (the split kernels only exist on the fused non-small branch), so on
    tiny images =on runs the assembled small layout. A/B the split
    layout on images past the small threshold (~the 1 MP serving shape).
    Trace-time env read, like every Sinkhorn knob (callers thread the
    result into their jit keys — pipeline.train_filter_stage2a's
    `split`)."""
    raw = os.environ.get("NLE_STAGE2_SPLIT", "auto").lower()
    if raw in ("off", "0", "false"):
        return False
    if raw not in ("auto", "on", "1", "true"):
        raise ValueError(
            f"NLE_STAGE2_SPLIT={raw!r}: expected auto/on/off")
    kernel_kind = os.environ.get("NLE_SINKHORN_KERNEL", "manual").lower()
    carrier = (kernel_kind == "manual"
               and _resolve_int16(_resolve_bf16_iters(max_iter, None)))
    if raw in ("on", "1", "true") and not carrier:
        raise ValueError(
            "NLE_STAGE2_SPLIT=on but the int16 carrier does not resolve "
            f"(NLE_SINKHORN_KERNEL={kernel_kind!r}, NLE_SINKHORN_INT16/"
            "bf16-lead state): the split layout cannot run without the "
            "packed carrier — fix the conflicting knob or use auto")
    return carrier


def sinkhorn_vectors_split(Um_pad: jax.Array, lam_pad: jax.Array,
                           phib_pad: jax.Array, max_iter: int, eps: float,
                           interpret: bool = False, tile: int = TILE_N):
    """Split-buffer twin of sinkhorn_vectors_fused's int16 path: the top
    (sampled-pixel) block Um stays a separate f32 (p, mpad) operand — its
    matvecs are m-sized XLA work — while ONLY the rest block streams as
    the per-column-scaled pair-packed int16 copy. The column scale is
    therefore taken over the REST rows alone and applied at the m-sized
    boundaries (t_q = scale*t in, scale*s_q out — the sharded trainer's
    convention, parallel/sharded.py _train_2a_q) instead of being folded
    into lam; the top block runs exact f32 (a strict fidelity improvement
    over quantizing it along with the rest, and what removes the need to
    ever materialize the concatenated buffer).

    Um_pad (p, mpad) f32, columns beyond the true m zero; lam_pad (mpad,)
    masked; phib_pad (npad_b, mpad) f32, rows beyond the true rest count
    and columns beyond m EXACT ZERO (the affinity builder's zero_tail
    contract). Returns (r_top (p,), c_top (p,), r_b (npad_b,),
    c_b (npad_b,), crush (0-d f32)) — pad entries of the rest vectors are
    zero; crush is carrier_crush_frac over the rest block (the runtime
    validity statistic, VERDICT r4 #2)."""
    p, mpad = Um_pad.shape
    npad_b = phib_pad.shape[0]
    _, t_eff = split_row_pad(1, mpad, tile)
    if npad_b % (2 * t_eff):
        raise ValueError(
            f"phib rows ({npad_b}) must follow split_row_pad "
            f"(2*{t_eff} multiple)")
    q32, scale, colmax = quantize_pack_int16(phib_pad)
    crush = carrier_crush_frac(phib_pad, scale)
    chunk_q = _packed_chunk(t_eff, npad_b // 2, mpad)

    ones_p = jnp.ones((p,), jnp.float32)
    # s0 = phi^T @ ones: exact f32; the rest term is the column sum so it
    # fuses with the quantizer's abs-max reduce (one phib read).
    s0 = Um_pad.T @ ones_p + jnp.sum(phib_pad, axis=0)

    def halfstep(s):
        t = lam_pad * s
        xp = safe_reciprocal(Um_pad @ t, eps)
        xb, s_q = sinkhorn_halfstep_manual(q32, scale * t, eps,
                                           chunk=chunk_q,
                                           interpret=interpret)
        return xp, xb, Um_pad.T @ xp + scale * s_q

    zb = jnp.zeros((npad_b,), jnp.float32)
    if max_iter == 0:
        return ones_p, jnp.zeros((p,), jnp.float32), zb, zb, crush

    def body(_, st):
        cp, cb, s = st
        cp, cb, s = halfstep(s)
        _, _, s = halfstep(s)
        return cp, cb, s

    cp, cb, s = jax.lax.fori_loop(
        0, max_iter - 1, body, (jnp.zeros((p,), jnp.float32), zb, s0))
    cp, cb, s = halfstep(s)
    rp, rb, _ = halfstep(s)
    return rp, cp, rb, cb, crush


def _packed_chunk(tile: int, npad_packed: int, mpad: int) -> int:
    """PACKED-row chunk size for the int16 pair-packed Sinkhorn stream.

    One packed row is an int32 word-row carrying TWO logical rows, so
    chunk = tile//2 streams the same logical row count per DMA as the
    f32 path at half the bytes. The kernel frame holds the 2 int32 DMA
    slots (4 B/word) PLUS the lo/hi f32 unpack temps (2 arrays x
    4 B/word, budget 2 live iterations: Mosaic overlaps the loop), i.e.
    24 bytes/word total. An earlier unpacked-s16 variant sized its frame
    by the DMA slots alone and compiled past the 16 MB scoped-VMEM
    limit on the real chip (25.2 MB at the 1 MP serving shape) —
    interpret-mode CPU tests cannot catch VMEM limits, only a real TPU
    compile can, so the formula is pinned by a unit test instead.
    Shrinks for wide factors; every candidate divides npad_packed
    because tile is a power of two and npad_packed is a tile//2
    multiple."""
    def frame_bytes(c):
        return 24 * c * mpad
    chunk = tile // 2
    while chunk > 128 and (npad_packed % chunk != 0
                           or frame_bytes(chunk) > 12 * 2**20):
        chunk //= 2
    return chunk


def sinkhorn_vectors_fused(phi: jax.Array, lam: jax.Array, max_iter: int,
                           eps: float, interpret: bool = False,
                           tile: int = TILE_N, n: int | None = None,
                           bf16_iters: int | None = None,
                           with_stat: bool = False,
                           int16: bool | None = None):
    """Drop-in replacement for ops.sinkhorn.sinkhorn_vectors using the fused
    kernel: returns (r, c) each (n,) for phi (n, m), lam (m,) masked.
    With `with_stat`, returns (r, c, crush): carrier_crush_frac when the
    int16 carrier engaged, else the sentinel -1.0 (0-d f32) — the runtime
    validity statistic the host guard reads off the rc fetch (VERDICT r4
    #2). `int16` overrides the env resolve per call (the guard's f32
    re-dispatch passes False; None defers to _resolve_int16 as before).

    phi may be passed pre-padded (rows/cols beyond the true extent zero):
    give the true row count via `n`; column padding is inferred from lam.

    Mixed-precision schedule: the first `bf16_iters` iterations stream a
    bfloat16 copy of phi (half the HBM bytes of the pipeline's dominant
    stage), then the remaining iterations re-run on the float32 phi.
    OFF BY DEFAULT and NOT golden-safe: the polish cannot erase the bf16
    trajectory error within the reference's fixed iteration budget on
    some scenes (see _resolve_bf16_iters — bird/rock2 fail the 45 dB
    gate). Preview/fast mode only.

    NOTE: NLE_SINKHORN_KERNEL / NLE_SINKHORN_BF16 are read at TRACE time
    (this function runs inside jitted stage 2a): changing them mid-process
    does not affect already-compiled shapes — set them before the first
    training of a shape, or use a fresh process (bench.py does).
    """
    nrows, mcols = phi.shape
    n = nrows if n is None else n
    m = lam.shape[0]
    mpad = _round_up(max(mcols, 1), 128)
    # Two phi chunk buffers must fit VMEM alongside the outputs: shrink the
    # chunk for wide factors (dense sampling grids, p > ~768).
    while tile > 256 and 2 * tile * mpad * 4 > 12 * 2**20:
        tile //= 2
    npad = _round_up(max(nrows, 1), tile)
    if (npad, mpad) == (nrows, mcols):
        phi_pad = phi.astype(jnp.float32)
    else:
        phi_pad = jnp.pad(phi.astype(jnp.float32),
                          ((0, npad - nrows), (0, mpad - mcols)))
    lam_pad = jnp.pad(lam.astype(jnp.float32), (0, mpad - m))

    r0 = jnp.ones((npad,), jnp.float32)

    kernel_kind = os.environ.get("NLE_SINKHORN_KERNEL", "manual").lower()
    if kernel_kind not in ("manual", "auto"):
        # A typo must not silently select the manual kernel and benchmark
        # it against itself (same fail-fast rule as NLE_SINKHORN_BF16).
        raise ValueError(
            f"NLE_SINKHORN_KERNEL={kernel_kind!r}: expected manual|auto")
    if kernel_kind == "auto":
        def halfstep(p, t):
            return sinkhorn_halfstep_pallas(p, t, eps, interpret=interpret,
                                            tile=tile)
    else:
        def halfstep(p, t):
            return sinkhorn_halfstep_manual(p, t, eps, chunk=tile,
                                            interpret=interpret)

    n_bf16 = _resolve_bf16_iters(max_iter, bf16_iters)
    if kernel_kind == "auto":
        n_bf16 = 0  # the auto-pipelined kernel is f32-only

    use_int16 = ((_resolve_int16(n_bf16) if int16 is None else bool(int16))
                 and kernel_kind == "manual")
    # s0 = phi^T @ ones, as the DOT (zero pad rows: only true rows count,
    # so s0 is exact). A column-sum form (fusing with the quantizer's
    # abs-max reduce) was tried in r4 and REVERTED for this assembled
    # path: the measured saving is ~1 ms (the GEMV streams phi at full
    # rate), while the ulp-class s0 reordering moved the chaotic
    # trajectory enough to cost taj-denoise 14 dB of golden margin
    # (62.5 -> 48.2, still over the 45 gate — not worth the risk). The
    # SPLIT-buffer path (sinkhorn_vectors_split) keeps its column-sum
    # form: its two-buffer s0 is structurally different anyway and its
    # configs gate with wide margins (GOLDEN_TPU.jsonl r4).
    s0 = phi_pad.T @ r0

    state = (r0, jnp.zeros((npad,), jnp.float32), s0)
    if n_bf16 > 0:
        phi_bf = phi_pad.astype(jnp.bfloat16)
        # bf16 chunks are half the bytes: double the chunk when the row
        # padding allows it (measured DMA sweet spot on v5e).
        chunk_bf = 2 * tile
        while chunk_bf > tile and (npad % chunk_bf != 0
                                   or 2 * chunk_bf * mpad * 2 > 12 * 2**20):
            chunk_bf //= 2

        if kernel_kind == "auto":
            halfstep_bf = halfstep
        else:
            def halfstep_bf(p, t):
                return sinkhorn_halfstep_manual(p, t, eps, chunk=chunk_bf,
                                                interpret=interpret)

        def body_bf(_, st):
            r, c, s = st
            c, s = halfstep_bf(phi_bf, lam_pad * s)
            r, s = halfstep_bf(phi_bf, lam_pad * s)
            return r, c, s

        state = jax.lax.fori_loop(0, n_bf16, body_bf, state)

    if use_int16:
        # int16 per-column-scaled copy for ALL remaining iterations (see
        # _resolve_int16 for the algebra, fidelity evidence, and why this
        # is the DEFAULT), PAIR-PACKED into an int32 container: word
        # (r, c) carries logical row r in its low 16 bits and row
        # r + npad/2 in its high 16 bits. The int32 container keeps plain
        # T(8,128) tiling (a bare s16 buffer gets XLA's (2,1) pair-packed
        # 16-bit tiling, forfeiting the narrow-DMA win). In situ: 1.92
        # ms/halfstep vs f32's 4.0 at the 1 MP p=600 shape. Prep cost is
        # ~2.5 phi sweeps (abs-max reduce + quantized packed write),
        # amortized over 2*max_iter halfstep sweeps.
        q32, scale, colmax = quantize_pack_int16(phi_pad)
        crush = carrier_crush_frac(phi_pad, scale) if with_stat else None
        lam_q = lam_pad * jnp.where(colmax > 0, scale, 0.0) ** 2
        chunk_q = _packed_chunk(tile, npad // 2, mpad)

        def halfstep_q(p, t):
            return sinkhorn_halfstep_manual(p, t, eps, chunk=chunk_q,
                                            interpret=interpret)

        # The running s-vector lives in Q-scale (s_q = s / scale): the
        # kernel returns Q^T x directly, and lam_q = lam * scale^2 maps it
        # back inside the next half-step's t — no per-iteration rescaling.
        r, c, s = state
        sq = jnp.where(colmax > 0, s / scale, 0.0)

        def body_q(_, st):
            r, c, sq = st
            c, sq = halfstep_q(q32, lam_q * sq)
            r, sq = halfstep_q(q32, lam_q * sq)
            return r, c, sq

        r, c, _ = jax.lax.fori_loop(n_bf16, max_iter, body_q, (r, c, sq))
        if with_stat:
            return r[:n], c[:n], crush
        return r[:n], c[:n]

    def body(_, st):
        r, c, s = st
        c, s = halfstep(phi_pad, lam_pad * s)
        r, s = halfstep(phi_pad, lam_pad * s)
        return r, c, s

    r, c, _ = jax.lax.fori_loop(n_bf16, max_iter, body, state)
    if with_stat:
        return r[:n], c[:n], jnp.float32(-1.0)
    return r[:n], c[:n]
