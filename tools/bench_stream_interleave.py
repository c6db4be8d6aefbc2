"""A/B the serving stream: edit-after-training (bench.py run_stream) vs
edits interleaved into the training stream from a consumer thread pool.

Rationale: with edits deferred to the end, the device drains the training
queue and then runs 8 applies back-to-back (~0.4 s serial tail at 1 MP x 8
that overlaps nothing). Feeding each frame's edit to a thread as soon as
train_filters_iter yields its filter keeps the apply work inside the
training stream — the device executes it between Sinkhorn programs it is
already queueing, and the result fetches ride pool threads underneath the
next frame's device work. (The earlier measured 6% regression interleaved
the edits on the MAIN thread, which stalls stage-1 submission — this keeps
the main thread training-only.)

Usage: python tools/bench_stream_interleave.py [--mp=1.0] [--repeats=8]
Prints per-variant MP/s, best of 2, same session.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np


def main():
    mp_target = 1.0
    repeats = 8
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])

    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    from bench_input import load_input
    from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np
    from nle_tpu.models.batch import train_filters_iter, train_filters_pipelined
    from nle_tpu.models.filter import NLEFilter

    img = load_input(mp_target)
    mp = img.shape[0] * img.shape[1] / 1e6
    params = (20, 30, 500.0, 10.0, 50, 50)
    weights = [4.0, 3.0, 4.0, 1.0]

    rng = np.random.default_rng(0)
    frames_bgr = []
    span = np.arange(-2 * repeats, 2 * repeats + 1)
    for d in rng.choice(span, size=repeats, replace=False):
        lab = bgr_to_lab_u8_np(img)
        lab[..., 0] = np.clip(lab[..., 0].astype(np.int32) + int(d),
                              0, 255).astype(np.uint8)
        frames_bgr.append(lab_to_bgr_u8_np(lab))

    def channels():
        return [bgr_to_lab_u8_np(b)[..., 0].astype(np.float32)
                for b in frames_bgr]

    def run_deferred():
        flts = train_filters_pipelined(channels(), *params)
        with ThreadPoolExecutor(4) as ex:
            return list(ex.map(
                lambda bf: NLEFilter(trained=bf[1]).enhance(bf[0], weights),
                zip(frames_bgr, flts)))

    def run_interleaved():
        out = [None] * repeats
        with ThreadPoolExecutor(4) as ex:
            futs = []
            for i, flt in enumerate(train_filters_iter(channels(), *params)):
                futs.append(ex.submit(
                    lambda i=i, flt=flt: out.__setitem__(
                        i, NLEFilter(trained=flt).enhance(frames_bgr[i],
                                                          weights))))
            for f in futs:
                f.result()
        return out

    # Warmup compiles once (shared programs).
    run_deferred()
    ref = None
    for tag, fn in [("deferred", run_deferred),
                    ("interleaved", run_interleaved)] * 2:
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = fn()
            ts.append(time.perf_counter() - t0)
        if ref is None:
            ref = outs
        else:
            same = all(np.array_equal(a, b) for a, b in zip(ref, outs))
            if not same:
                print(f"  WARNING: {tag} outputs differ from deferred!")
        best = min(ts)
        print(f"{tag}: best {best:.3f} s -> {repeats * mp / best:.3f} MP/s")


if __name__ == "__main__":
    main()
