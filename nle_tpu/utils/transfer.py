"""Host<->device transfer helpers for the tunnel-attached TPU.

Measured transfer asymmetry on this platform (2026-08-17): uploads run at
~650 MB/s, but device->host fetches are LATENCY-bound per request — a
single large fetch crawls at ~0.2-4 MB/s, while the same bytes fetched as
concurrent ~1-4 MB slices reach ~40 MB/s (requests pipeline; sequential
chunks do not help). `fetch` is np.asarray with that fix applied: it
slices the leading axis and fetches the chunks from a thread pool.

Small arrays go through plain np.asarray — they are dominated by the
~30-60 ms per-request latency either way, and chunking only adds overhead.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# Threshold below which a single np.asarray is used as-is.
_SMALL_BYTES = 4 << 20
_CHUNK_BYTES = 2 << 20
# One-row-per-request leading-axis chunking is taken (no relayout, no HBM
# doubling) when there are at least this many rows AND each row stays
# within _BIG_ROW_BYTES (near the measured 1-4 MB request sweet spot).
_MIN_LEAD_CHUNKS = 8
_BIG_ROW_BYTES = 8 << 20
# Above that, the on-device flatten (a full relayout copy) is used only
# while the transient copy is modest; past _FLATTEN_LIMIT the per-row
# path is taken anyway — oversized requests degrade speed, an OOM kills.
_FLATTEN_LIMIT = 256 << 20
_WORKERS = 8

_executor: ThreadPoolExecutor | None = None
_chunk_executor: ThreadPoolExecutor | None = None
_executor_lock = threading.Lock()


def transfer_pool() -> ThreadPoolExecutor:
    """The shared TASK-level transfer executor — used to overlap whole
    fetches (which may themselves be chunked) with host compute
    (ops/pipeline.py host chain, models/factored.py multi-channel apply).

    fetch()'s internal chunk copies run on a SEPARATE pool: a fetch
    submitted to this pool blocks on its chunk futures, so routing the
    chunks through the same bounded pool would deadlock once _WORKERS
    fetches run as pool tasks simultaneously (every worker blocked on
    queued chunk tasks that can never start)."""
    global _executor
    if _executor is None:
        with _executor_lock:
            if _executor is None:
                _executor = ThreadPoolExecutor(
                    _WORKERS, thread_name_prefix="nle-fetch")
    return _executor


def _pool() -> ThreadPoolExecutor:
    # Chunk-copy pool, distinct from transfer_pool() (see docstring there).
    # Long-lived: fetch() runs on every device->host transfer and per-call
    # pool construction/teardown costs ~ms against ~50 ms fetches.
    global _chunk_executor
    if _chunk_executor is None:
        with _executor_lock:
            if _chunk_executor is None:
                _chunk_executor = ThreadPoolExecutor(
                    _WORKERS, thread_name_prefix="nle-fetch-chunk")
    return _chunk_executor


def fetch(arr) -> np.ndarray:
    """Device->host transfer of a jax array (or passthrough for numpy).

    Path choice, in order:
    1. rows <= _CHUNK_BYTES: group rows into ~2 MB leading-axis chunks
       (zero extra device memory — leading slices need no relayout).
    2. rows <= _BIG_ROW_BYTES and >= _MIN_LEAD_CHUNKS rows:
       one-row-per-request leading-axis chunking — still zero extra
       device memory, requests 2-8 MB each (a (600, 1M) f32 near chip
       capacity MUST take a no-relayout path: flattening it would
       allocate a second full-size copy and OOM).
    3. total <= _FLATTEN_LIMIT: flatten ON DEVICE and chunk the 1-D view
       — slicing the MINOR axis of a 2-D device array measured
       pathologically slow (a (2, 8M) u8 fetch: ~1.4 s either bare or
       column-chunked; ~0.4 s flattened+chunked); the relayout copy is
       bounded by the limit.
    4. else: one-row-per-request anyway — oversized requests only
       degrade throughput, a multi-GB relayout can kill the job."""
    if isinstance(arr, np.ndarray):
        return arr
    nbytes = getattr(arr, "nbytes", 0)
    if nbytes <= _SMALL_BYTES or arr.ndim == 0:
        return np.asarray(arr)
    shape = arr.shape
    row_bytes = max(1, nbytes // shape[0])
    if (row_bytes <= _CHUNK_BYTES
            or (row_bytes <= _BIG_ROW_BYTES
                and shape[0] >= _MIN_LEAD_CHUNKS)
            or nbytes > _FLATTEN_LIMIT):
        n = shape[0]
        src = arr
    else:
        n = arr.size
        src = arr.reshape(-1)
        row_bytes = max(1, nbytes // n)
    per_chunk = max(1, _CHUNK_BYTES // row_bytes)
    bounds = list(range(0, n, per_chunk)) + [n]
    out = np.empty((n,) + src.shape[1:], dtype=arr.dtype)

    def _copy(a: int, b: int) -> None:
        # Write straight into the destination slab: avoids holding every
        # chunk copy alive for a final concatenate (2x peak host memory).
        out[a:b] = np.asarray(src[a:b])

    futures = [_pool().submit(_copy, a, b)
               for a, b in zip(bounds[:-1], bounds[1:])]
    for f in futures:
        f.result()
    return out.reshape(shape)
