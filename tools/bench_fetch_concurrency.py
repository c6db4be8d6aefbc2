"""Does chunked-concurrent fetching help the stream's MID-SIZE payloads?

TIMELINE_STREAM.json (r5) shows the stream's two mid-size down-transfers —
Sb (640, 640) f32 ~1.4 MB and the edit u8 result ~1.0 MB — running at
2-10 MB/s on a loaded tunnel as SINGLE requests: both sit under fetch()'s
_SMALL_BYTES=4 MB threshold, so the threaded ~40 MB/s path never engages.
The r2 measurement that set the threshold ("4-way concurrent slicing NO
faster at 0.8/1.6/3.2 MB") was taken on a QUIET tunnel where a single
request already ran at ~47 MB/s; this tool re-tests under whatever load
the current hour has, INTERLEAVED (single/chunked/single/chunked), for
both payload shapes.

  cd /root/repo && python tools/bench_fetch_concurrency.py [--samples=6]
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    samples = 6
    for a in sys.argv[1:]:
        if a.startswith("--samples="):
            samples = int(a.split("=", 1)[1])
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
    import jax
    import jax.numpy as jnp

    pool = ThreadPoolExecutor(8)
    rng = np.random.default_rng(0)

    payloads = {
        "sb_f32_1.6MB": jnp.asarray(
            rng.normal(size=(640, 640)).astype(np.float32)),
        "edit_u8_1.0MB": jnp.asarray(
            rng.integers(0, 256, size=(999_424,), dtype=np.uint8)),
    }
    for v in payloads.values():
        np.asarray(v[:1])    # materialize

    def fetch_single(arr):
        return np.asarray(arr)

    def fetch_chunked(arr, ways):
        n = arr.shape[0]
        bounds = [n * i // ways for i in range(ways + 1)]
        futs = [pool.submit(lambda a=arr[bounds[i]:bounds[i + 1]]:
                            np.asarray(a)) for i in range(ways)]
        return np.concatenate([f.result() for f in futs], axis=0)

    variants = [("single", lambda a: fetch_single(a)),
                ("chunk2", lambda a: fetch_chunked(a, 2)),
                ("chunk4", lambda a: fetch_chunked(a, 4)),
                ("chunk8", lambda a: fetch_chunked(a, 8))]

    @jax.jit
    def bump_f32(a, i):
        return a + i

    @jax.jit
    def bump_u8(a, i):
        return a ^ i

    def fresh(arr, i):
        """A NEW device array with new contents each call: np.asarray on
        an unchanged jax array returns its CACHED host copy after the
        first conversion (0 ms — the warmed single path must not be
        allowed to win that way). A tiny probe fetch forces the compute
        to finish so the timed span is pure transfer."""
        if arr.dtype == jnp.uint8:
            out = bump_u8(arr, jnp.uint8(i % 251 + 1))
        else:
            out = bump_f32(arr, jnp.float32(i))
        np.asarray(out[:1])
        return out

    for name, arr in payloads.items():
        # warmup each variant once (slices compile/alloc)
        for k, (_, fn) in enumerate(variants):
            fn(fresh(arr, 1000 + k))
        acc = {v: [] for v, _ in variants}
        i = 0
        for _ in range(samples):
            for v, fn in variants:     # interleaved
                i += 1
                a = fresh(arr, i)
                t0 = time.perf_counter()
                out = fn(a)
                dt = time.perf_counter() - t0
                assert out.nbytes == arr.nbytes
                acc[v].append(1e3 * dt)
        print(json.dumps({
            "payload": name, "bytes": int(arr.nbytes),
            **{v: {"best_ms": round(min(t), 1),
                   "med_ms": round(sorted(t)[len(t) // 2], 1),
                   "best_MBps": round(arr.nbytes / 1e3 / min(t), 1)}
               for v, t in acc.items()}}), flush=True)


if __name__ == "__main__":
    main()
