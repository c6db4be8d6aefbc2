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
_WORKERS = 8

_executor: ThreadPoolExecutor | None = None
_executor_lock = threading.Lock()


def transfer_pool() -> ThreadPoolExecutor:
    """The shared device<->host transfer executor — also used to overlap
    one-off fetches with host compute (ops/pipeline.py host chain)."""
    return _pool()


def _pool() -> ThreadPoolExecutor:
    # One long-lived pool: fetch() runs on every device->host transfer and
    # per-call pool construction/teardown costs ~ms against ~50 ms fetches.
    global _executor
    if _executor is None:
        with _executor_lock:
            if _executor is None:
                _executor = ThreadPoolExecutor(
                    _WORKERS, thread_name_prefix="nle-fetch")
    return _executor


def fetch(arr) -> np.ndarray:
    """Device->host transfer of a jax array (or passthrough for numpy).

    The array is flattened ON DEVICE first (a trivial relayout next to the
    transfer cost) and the 1-D view chunked along its only axis: leading-
    axis chunking would leave a channel-major (C, N) result with a tiny
    leading dim on the latency-bound single-request path, and slicing the
    MINOR axis of a 2-D device array measured pathologically slow
    (a (2, 8M) u8 fetch: ~1.4 s either bare or column-chunked; ~0.4 s
    flattened+chunked)."""
    if isinstance(arr, np.ndarray):
        return arr
    nbytes = getattr(arr, "nbytes", 0)
    if nbytes <= _SMALL_BYTES or arr.ndim == 0:
        return np.asarray(arr)
    shape = arr.shape
    flat = arr.reshape(-1)
    n = flat.shape[0]
    per_chunk = max(1, _CHUNK_BYTES // max(1, nbytes // n))
    bounds = list(range(0, n, per_chunk)) + [n]
    out = np.empty((n,), dtype=arr.dtype)

    def _copy(a: int, b: int) -> None:
        # Write straight into the destination slab: avoids holding every
        # chunk copy alive for a final concatenate (2x peak host memory).
        out[a:b] = np.asarray(flat[a:b])

    futures = [_pool().submit(_copy, a, b)
               for a, b in zip(bounds[:-1], bounds[1:])]
    for f in futures:
        f.result()
    return out.reshape(shape)
