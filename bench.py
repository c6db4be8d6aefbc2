"""Benchmark: end-to-end enhance throughput on ~1 MP inputs (the
BASELINE.md headline metric; target >= 1 MP/s on one v5e chip).

Measures the SERVING path: a stream of distinct ~1 MP frames (rock2.jpg —
the reference's "requires a lot of memory" case, README.md:82 — resized,
with per-frame exposure jitter so no work can be cached across frames)
trained with the pipelined driver (models/batch.py: frame i+1's device
Sinkhorn overlaps frame i's host-f64 chain) and each edited end to end —
Lab conversion, filter training, eigenvalue transform, apply, Lab
round-trip — with the rock2 golden parameters (20 30 500 10 50 50).
Wall-clock covers first-submit to last-output. Prints one JSON line.

NLE_BENCH_MODE=single reverts to the sequential per-image measurement
(per-image latency; ~1.0-1.1 MP/s vs ~1.74 MP/s pipelined+interleaved —
the tunnel adds ±15% run-to-run).
"""

import json
import os
import sys
import time

import numpy as np


# The ONE benchmark input definition, shared with the A/B tools
# (tools/bench_batch.py etc.) so the headline bench and the comparison
# tools can never drift onto different inputs.
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from bench_input import load_input  # noqa: E402


def main():
    target_mp = float(os.environ.get("NLE_BENCH_MP", "1.0"))
    repeats = int(os.environ.get("NLE_BENCH_REPEATS", "8"))
    mode = os.environ.get("NLE_BENCH_MODE", "stream")

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.models.filter import NLEFilter

    enable_persistent_cache()
    img = load_input(target_mp)
    mp = img.shape[0] * img.shape[1] / 1e6
    params = (20, 30, 500.0, 10.0, 50, 50)
    weights = [4.0, 3.0, 4.0, 1.0]

    def run_single(frame):
        # train + edit with the apply fused into stage 2b (one dispatch
        # round trip saved per frame vs the two-call sequence).
        return NLEFilter().train_and_enhance(frame, *params, weights)

    if mode == "single":
        run_single(img)  # warmup: compile
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run_single(img)
            times.append(time.perf_counter() - t0)
        value = mp / min(times)
    else:
        # Serving stream: distinct BGR frames (exposure jitter prevents any
        # cross-frame caching), pipelined training + per-frame edit — the
        # same flow the HTTP service's coalescing path runs.
        from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np

        rng = np.random.default_rng(0)
        frames_bgr = []
        # Distinct offsets (sampled without replacement) so no two frames
        # are byte-identical — the no-cross-frame-caching premise.
        span = np.arange(-2 * repeats, 2 * repeats + 1)
        for d in rng.choice(span, size=repeats, replace=False):
            lab = bgr_to_lab_u8_np(img)
            lab[..., 0] = np.clip(lab[..., 0].astype(np.int32) + int(d),
                                  0, 255).astype(np.uint8)
            frames_bgr.append(lab_to_bgr_u8_np(lab))
        def run_stream():
            from concurrent.futures import ThreadPoolExecutor

            from nle_tpu.models.batch import train_filters_iter

            # LAZY channels: converting all 8 frames to Lab up front is
            # ~50 ms/frame of serial host work with the device idle;
            # train_filters_iter pulls frame i+1's channel between
            # submissions, so a generator slides each conversion under
            # frame i's device Sinkhorn (same total host work, no serial
            # prefix).
            labs = [None] * repeats

            def channels():
                for i, b in enumerate(frames_bgr):
                    lab = bgr_to_lab_u8_np(b)
                    # Keep the full Lab plane: the edit consumer reuses it
                    # (enhance(lab_u8=...)), saving a second ~18 ms/frame
                    # forward conversion on the single host core.
                    labs[i] = lab
                    yield lab[..., 0].astype(np.float32)
            # Each frame's edit is handed to a consumer thread as soon as
            # train_filters_iter yields its filter: the device executes the
            # apply inside the training stream it is already queueing
            # (instead of an 8-apply serial tail after training), and the
            # result fetches + Lab round-trips ride pool threads under the
            # next frame's device work. The MAIN thread stays training-only
            # — edits on the main thread stall stage-1 submission (measured
            # 6% slower). Same-session A/B (tools/bench_stream_interleave):
            # deferred 1.61-1.63 -> interleaved 1.75-1.76 MP/s.
            out = [None] * repeats

            def _edit(i, flt):
                f = NLEFilter(trained=flt)
                # Reuse the producer's Lab conversion (seed_lab_cache, the
                # serving flow's mechanism): ~18 ms/frame of single-core
                # host LUT work the edit would otherwise repeat.
                f.seed_lab_cache(frames_bgr[i], labs[i])
                return f.enhance(frames_bgr[i], weights)

            with ThreadPoolExecutor(4) as ex:
                futs = [
                    ex.submit(
                        lambda i=i, flt=flt: out.__setitem__(
                            i, _edit(i, flt)))
                    for i, flt in enumerate(
                        train_filters_iter(channels(), *params))
                ]
                for f in futs:
                    f.result()
            assert all(o is not None for o in out)
            return out

        run_stream()  # warmup: compile
        times = []
        # min-of-3: tunnel load swings +-15-25% run-to-run (measured);
        # three timed passes make the reported best materially more stable
        # than two for ~8 s of extra wall.
        for _ in range(3):
            t0 = time.perf_counter()
            outs = run_stream()
            times.append(time.perf_counter() - t0)
            assert len(outs) == repeats
        value = repeats * mp / min(times)
    print(json.dumps({
        "metric": "enhance_throughput_1mp",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(value / 1.0, 3),
        # stream = pipelined serving throughput (the default headline);
        # single = sequential per-image latency. Distinguishable so
        # historical comparisons never mix the two regimes silently.
        "mode": mode,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
