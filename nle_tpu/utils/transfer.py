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
# Leading dims at or above this take one-row-per-request chunking even
# when rows exceed _CHUNK_BYTES (no relayout, no HBM doubling); below it
# the on-device flatten is used (tiny-C channel-major case).
_MIN_LEAD_CHUNKS = 8
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

    Chunks along the LEADING axis when rows are small enough that row
    groups hit the ~2 MB request sweet spot (zero extra device memory:
    leading-axis slices need no relayout). When single rows exceed the
    chunk size but the leading dim still offers enough slices
    (>= _MIN_LEAD_CHUNKS), one-row-per-request chunking is used — still
    zero extra device memory, requests a few MB each (a (600, 1M) f32
    near chip capacity MUST take this path: flattening it would relayout
    a second full-size copy and OOM). Only arrays with a TINY leading dim
    — channel-major (C, N) results — are flattened ON DEVICE first and
    the 1-D view chunked: slicing the MINOR axis of a 2-D device array
    measured pathologically slow (a (2, 8M) u8 fetch: ~1.4 s either bare
    or column-chunked; ~0.4 s flattened+chunked), and at C <= 4 the
    relayout copy is small."""
    if isinstance(arr, np.ndarray):
        return arr
    nbytes = getattr(arr, "nbytes", 0)
    if nbytes <= _SMALL_BYTES or arr.ndim == 0:
        return np.asarray(arr)
    shape = arr.shape
    row_bytes = max(1, nbytes // shape[0])
    if row_bytes <= _CHUNK_BYTES or shape[0] >= _MIN_LEAD_CHUNKS:
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
