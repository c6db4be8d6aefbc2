"""Temporal warm-start measurement (VERDICT r4 #8): PSNR cost vs
throughput gain of reusing the previous trained filter on near-identical
frames, on the bench's jittered-rock2 1 MP stream.

The bench stream jitters each frame's L channel by a distinct offset in
[-16, 16] (mean |delta| vs frame 0 spans ~1-16), so a threshold sweep
exercises partial reuse. For each threshold: run the stream with
reuse_delta set, count retrains, measure MP/s, and compare every frame's
output against its own per-frame-trained output (PSNR — the fidelity cost
of the approximation). Interleaved with threshold=None baselines.

  cd /root/repo && python tools/bench_warmstart.py [--mp=1.0] [--repeats=8]
      [--thresholds=4,20]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    mp_target = 1.0
    repeats = 8
    thresholds = (4.0, 20.0)
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--thresholds="):
            thresholds = tuple(
                float(x) for x in a.split("=", 1)[1].split(","))
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
    from bench_input import load_input
    from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np
    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.models.batch import train_filters_iter
    from nle_tpu.models.filter import NLEFilter

    enable_persistent_cache()
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

    def run_stream(reuse):
        from concurrent.futures import ThreadPoolExecutor

        labs = [None] * repeats

        def channels():
            for i, b in enumerate(frames_bgr):
                lab = bgr_to_lab_u8_np(b)
                labs[i] = lab
                yield lab[..., 0].astype(np.float32)

        out = [None] * repeats
        flts_seen = [None] * repeats   # hold refs: freed objects reuse
        #                                id(), which undercounts

        def _edit(i, flt):
            f = NLEFilter(trained=flt)
            f.seed_lab_cache(frames_bgr[i], labs[i])
            return f.enhance(frames_bgr[i], weights)

        with ThreadPoolExecutor(4) as ex:
            futs = []
            for i, flt in enumerate(train_filters_iter(
                    channels(), *params, reuse_delta=reuse)):
                flts_seen[i] = flt
                futs.append(ex.submit(
                    lambda i=i, flt=flt: out.__setitem__(
                        i, _edit(i, flt))))
            for f in futs:
                f.result()
        assert all(o is not None for o in out)
        return out, len({id(f) for f in flts_seen})

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    base_out, _ = run_stream(None)     # warmup + per-frame reference
    for reuse in thresholds:
        # interleave: baseline then warm-start, 2 samples each
        rows = []
        for _ in range(2):
            t0 = time.perf_counter()
            _, n0 = run_stream(None)
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs, n_trained = run_stream(reuse)
            t_ws = time.perf_counter() - t0
            worst = min(psnr(a, b) for a, b in zip(base_out, outs))
            rows.append({
                "reuse_delta": reuse,
                "mps_base": round(repeats * mp / t_base, 3),
                "mps_warmstart": round(repeats * mp / t_ws, 3),
                "filters_trained": n_trained,
                "worst_psnr_vs_perframe_db": round(worst, 1),
            })
            print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
