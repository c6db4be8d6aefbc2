"""Pipelined multi-image training: overlap host-f64 islands with device work.

The single-image pipeline alternates host and device phases (stage 1 f64
eigh -> device stage 2a -> host f64 chain -> device stage 2b); each side
idles while the other works. For a stream of images this schedules image
i+1's device stage 2a behind image i's, so image i's host chain (and image
i+2's stage 1) runs WHILE the device sweeps Sinkhorn for i+1 — JAX's async
dispatch provides the queueing; the only blocking point per image is the
(2, mb)-sized rc fetch of its balancing vectors (~5 KB; Sb rides the
async transfer pool).

Per-image cost approaches max(device_time, host_time) instead of their sum
(measured ~1.3-1.5x throughput on 1 MP streams, tools/bench_batch.py).

Caveats:
- stage 2 is compiled per (p, mb) where mb is the 128-bucketed kept rank
  (ops/pipeline.py bucket_m) — a stream with varied per-image ranks shares
  one program per bucket instead of one per exact m.
- the one-image lookahead keeps TWO (N, m) phi buffers alive on the device
  (image i's for stage 2b while image i+1 sweeps Sinkhorn), so the largest
  image this driver handles is ~half the single-image dense ceiling
  (~2.5 MP at m = 600 on a 16 GB chip).

No reference counterpart (the reference trains one filter per process run);
this is the serving-path extension of NLEFilter (models/filter.py).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from nle_tpu.models.filter import TrainedFilter
from nle_tpu.ops.affinity import bandwidth_weights
from nle_tpu.ops.pipeline import (
    _cast_channel,
    _grid_device_arrays,
    bucket_m,
    check_carrier_guard,
    host_orthogonalize,
    ka_eigh_host64,
    pack_channel,
    pack_stage1,
    pack_stage2b_upload,
    resolve_sb_tri,
    stage2_dense_small,
    stage2b_factor_scaled,
    submit_sb_fetch,
    train_filter_stage2a,
    train_filter_stage2b,
)
from nle_tpu.ops.sampling import sample_grid
from nle_tpu.utils.logging import logger, warn_truncation


def fits_pipeline(n_pixels: int, n_row_samples: int,
                  n_col_samples: int, lookahead: int = 1) -> bool:
    """Whether the pipelined schedule's phi lookahead fits the chip.

    A lookahead of L keeps L+1 dense (npad, mpad) phi buffers alive
    (see module docstring; the default L=1 is the classic two-phi rule),
    so L+1 phis must fit where the single-image train_filter allows one
    plus headroom. This is the shared capacity rule for every consumer of
    train_filters_iter (serving /enhance coalescing, nle-batch); past it,
    train_filters_iter itself falls back to sequential streaming-capable
    training rather than OOM the one chip."""
    from nle_tpu.ops.pipeline import _STREAM_BYTES_LIMIT

    mpad_est = -(-(n_row_samples * n_col_samples) // 128) * 128
    phi_bytes = 4 * n_pixels * mpad_est
    return (lookahead + 1) * phi_bytes <= 2 * ((3 * _STREAM_BYTES_LIMIT)
                                               // 4)


def train_filters_pipelined(
    channels,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int = 10,
    n_eig_vectors: int = 5,
    *,
    eps: float = 1e-10,
) -> list[TrainedFilter]:
    """Train one filter per channel (iterable of (H, W) float arrays, all
    the same shape), software-pipelined across the host/device boundary.
    Returns TrainedFilters whose eigvecs stay on the device in packed order
    (perm set), ready for NLEFilter(trained=...) editing."""
    out = list(train_filters_iter(
        channels, n_row_samples, n_col_samples, hx, hy,
        n_sinkhorn_iter, n_eig_vectors, eps=eps))
    if out:
        # Force completion with a scalar fetch so callers can time fairly:
        # on the axon platform jax.block_until_ready can return before
        # execution completes (CLAUDE.md), but a value fetch cannot.
        np.asarray(out[-1].eigvecs[:1, :1])
    return out


def train_filters_iter(
    channels,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int = 10,
    n_eig_vectors: int = 5,
    *,
    eps: float = 1e-10,
    lookahead: int | None = None,
    reuse_delta: float | None = None,
):
    """Generator form of train_filters_pipelined: yields each channel's
    TrainedFilter as soon as its host-f64 chain completes and its stage-2b
    is DISPATCHED (eigvecs are async device arrays).

    lookahead: how many frames may be submitted ahead of the one being
    finished (default 1 — the classic two-phi schedule; env
    NLE_STREAM_LOOKAHEAD overrides when the argument is None). Each
    in-flight frame holds one dense phi buffer on the chip, so the value
    is clamped to capacity (fits_pipeline).

    reuse_delta: OPT-IN temporal warm-start for frame streams (VERDICT r4
    #8; explicitly NOT a default): when set, a frame whose mean absolute
    L delta vs the last TRAINED frame is <= reuse_delta yields that
    frame's TrainedFilter instead of training its own — the edit still
    runs on the frame's own channel (apply's y_cache is content-guarded),
    so only the FILTER is approximated. The nonlocal filter depends on
    the scene's affinity structure, which small exposure wiggles barely
    move; measured cost/gain on the bench's jittered-rock2 stream:
    tools/bench_warmstart.py. The comparison is against the last trained
    frame (not the previous frame), so drift cannot accumulate
    unboundedly: the first frame past the threshold retrains and becomes
    the new reference.

    Use for first-result LATENCY: frame 0's filter is ready after ~1 train
    instead of after the whole stream. For THROUGHPUT, prefer consuming the
    list form and editing afterwards — editing inside the loop makes the
    consumer's device fetches queue behind the next frame's Sinkhorn and
    stalls stage-1 submission (measured ~6% slower on 8x1 MP streams)."""
    # Lazy: only the FIRST channel is pulled upfront (its shape configures
    # the grid and the capacity decision); the rest stream one at a time —
    # materializing the whole iterable would hold every frame of a long
    # stream in host RAM and delay frame 0's filter until the producer
    # finished (defeating the first-result-latency contract above).
    chan_it = iter(channels)
    try:
        first = np.asarray(next(chan_it))
    except StopIteration:
        return
    nrows, ncols = first.shape

    def validated():
        yield first
        for c in chan_it:
            c = np.asarray(c)
            if c.shape != (nrows, ncols):
                raise ValueError(
                    "pipelined training requires same-shape channels")
            yield c

    channels = validated()
    grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)
    if not fits_pipeline(grid.n_pixels, n_row_samples, n_col_samples):
        # Past the two-phi lookahead ceiling: the pipelined schedule would
        # OOM where the per-image train_filter succeeds (it auto-selects
        # the phi-free streaming stage 2). Train sequentially instead —
        # the host/device overlap is lost, but the frames complete.
        from nle_tpu.ops.pipeline import train_filter

        logger.warning(
            "pipelined trainer: %dx%d at %dx%d samples exceeds the two-phi "
            "lookahead ceiling; training sequentially (streaming stage 2).",
            nrows, ncols, n_row_samples, n_col_samples)
        seq_ref = None
        seq_filter = None
        for chan in channels:
            if (reuse_delta is not None and seq_ref is not None
                    and float(np.mean(np.abs(chan.astype(np.float32, copy=False)
                             - seq_ref.astype(np.float32, copy=False))))
                    <= reuse_delta):
                yield seq_filter     # same warm-start rule as the
                continue             # pipelined schedule below
            if reuse_delta is not None:
                seq_ref = chan
            packed_np, is_8bit = pack_channel(chan, grid.perm)
            # Ship the packed u8 channel (exact in ANY compute dtype);
            # non-8-bit channels pass packed_y_dev=None so train_filter
            # packs at its own resolved dtype — pre-casting to f32 here
            # would silently degrade a float64 run's stage-2 input.
            y_dev = jnp.asarray(packed_np) if is_8bit else None
            V, S = train_filter(
                chan, n_row_samples, n_col_samples, hx, hy,
                n_sinkhorn_iter, n_eig_vectors, eps=eps, grid=grid,
                pixel_order=False, packed_y_dev=y_dev)[:2]
            seq_filter = TrainedFilter(
                V, S, nrows, ncols, perm=grid.perm,
                y_cache=(packed_np, y_dev) if is_8bit else None)
            yield seq_filter
        return
    p = grid.n_samples
    perm, rr, cc = _grid_device_arrays(grid, jnp.float32)
    sw, pw = bandwidth_weights(hx, hy, jnp.float32)

    def submit(chan):
        """Host stage 1 + async device stage 2a for one channel."""
        Um64, lam64, _ = ka_eigh_host64(
            chan[grid.sel_rows, grid.sel_cols].astype(np.float64),
            grid.sel_rows, grid.sel_cols, hx, hy, eps,
        )
        m = lam64.shape[0]
        if m == 0:
            # Same clean error train_filter raises (a NaN-poisoned frame
            # keeps zero eigenvalues above eps); proceeding would build
            # zero-width stage-2 shapes and crash obscurely downstream.
            raise ValueError(
                "Affinity matrix Ka has no eigenvalues above eps.")
        mb = bucket_m(m, p)
        warn_truncation(p, m, eps)
        packed_np, is_8bit = pack_channel(chan, grid.perm)
        y_cache = None
        if is_8bit:
            y_u8 = jnp.asarray(packed_np)
            # Keep the uploaded u8 buffer: the serving flow edits the very
            # channel it trained on, so apply_u8 reuses it (one tunnel round
            # trip saved per frame).
            y_cache = (packed_np, y_u8)
            y = _cast_channel(y_u8, jnp.float32)
        else:
            y = jnp.asarray(packed_np.astype(np.float32))
        from nle_tpu.ops.pallas.sinkhorn_kernel import resolve_split_stage2

        rc_dev, sb_dev, phi_store, c_rest = train_filter_stage2a(
            y, rr, cc, jnp.asarray(pack_stage1(Um64, lam64, mb=mb)),
            sw, pw, p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter, eps=eps,
            small=stage2_dense_small(grid.n_pixels, mb),
            split=resolve_split_stage2(n_sinkhorn_iter),
            sb_tri=resolve_sb_tri(),
        )
        return (rc_dev, sb_dev, phi_store, c_rest, Um64, lam64, m, mb,
                y_cache, y)

    def finish(state):
        """Blocking fetch + host f64 chain + async device stage 2b."""
        (rc_dev, sb_dev, phi_store, c_rest, Um64, lam64, m, mb,
         y_cache, y) = state
        # Sb fetch first: it rides the tunnel concurrently with the blocking
        # rc fetch (measured ~30-60 ms earlier in hand, rc unharmed).
        sb_resolve = submit_sb_fetch(sb_dev)
        rc_np = np.asarray(rc_dev, np.float64)  # waits for this image's 2a
        if check_carrier_guard(rc_np):
            # Same guard + f32 re-dispatch as train_filter (ops/pipeline):
            # this frame's input is out of the int16 carrier's validity
            # domain. The stage-1 upload is rebuilt from the host copies.
            rc_dev, sb_dev, phi_store, c_rest = train_filter_stage2a(
                y, rr, cc, jnp.asarray(pack_stage1(Um64, lam64, mb=mb)),
                sw, pw, p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter,
                eps=eps, small=stage2_dense_small(grid.n_pixels, mb),
                split=False, int16=False, sb_tri=resolve_sb_tri(),
            )
            sb_resolve = submit_sb_fetch(sb_dev)
            rc_np = np.asarray(rc_dev, np.float64)
        k = min(n_eig_vectors, m)
        va_np, Sq = host_orthogonalize(rc_np, sb_resolve, Um64, lam64,
                                       m, mb, k, eps)
        # Split-buffer factor (the int16 default's tuple layout): the host
        # packs [top; GrT] instead of [Va | GrT] — same protocol as
        # train_filter (ops/pipeline.py pack_stage2b_upload).
        va_grt = jnp.asarray(
            pack_stage2b_upload(isinstance(phi_store, tuple), va_np,
                                rc_np, Um64, m, p, k), jnp.float32)
        V_packed = train_filter_stage2b(
            phi_store, c_rest, va_grt, n=grid.n_pixels, mb=mb,
            scaled=stage2b_factor_scaled(grid.n_pixels, mb))
        return TrainedFilter(V_packed, jnp.asarray(Sq, jnp.float32),
                             nrows, ncols, perm=grid.perm, y_cache=y_cache)

    # Clamp the requested lookahead to what the chip holds (each in-flight
    # frame keeps one dense phi alive); L=1 is the classic schedule, L=2
    # adds a second submitted frame so tunnel round-trip latency in
    # finish() overlaps one more frame's device work (VERDICT r5 lever).
    if lookahead is None:
        lookahead = int(os.environ.get("NLE_STREAM_LOOKAHEAD", "1"))
    look = max(1, int(lookahead))
    while look > 1 and not fits_pipeline(grid.n_pixels, n_row_samples,
                                         n_col_samples, lookahead=look):
        look -= 1
    if look != lookahead and lookahead > 1:
        logger.info("pipelined trainer: lookahead clamped %d -> %d "
                    "(phi capacity)", lookahead, look)
    from collections import deque

    _REUSE = object()        # sentinel: this frame reuses the last filter
    pending = deque()
    ref_chan = None          # channel of the last TRAINED frame
    last_filter = None       # its finished TrainedFilter

    def pop_finish():
        nonlocal last_filter
        item = pending.popleft()
        if item is _REUSE:
            # FIFO yield order guarantees the reference frame (which
            # precedes every reuser) has already been finished.
            return last_filter
        last_filter = finish(item)
        return last_filter

    for chan in channels:
        if (reuse_delta is not None and ref_chan is not None
                and float(np.mean(np.abs(chan.astype(np.float32, copy=False)
                                         - ref_chan.astype(np.float32, copy=False))))
                <= reuse_delta):
            pending.append(_REUSE)
        else:
            if reuse_delta is not None:
                ref_chan = chan
            pending.append(submit(chan))  # host stage 1 overlaps device
        if len(pending) > look:
            yield pop_finish()
    while pending:
        yield pop_finish()
