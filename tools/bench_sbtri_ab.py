"""Interleaved same-process A/B of the NLE_SB_TRI block-packed Sb fetch
(-32-40% of the stream's largest down-link payload; r5 timeline pinned
the stream residual to down-link bytes).

Toggles the env knob between passes — resolve_sb_tri reads it per call,
and the pack is a separate tiny jit, so both variants share every other
compiled program. Prints one JSON line per pass plus the summary.

  cd /root/repo && python tools/bench_sbtri_ab.py [--mp=1.0] [--repeats=8]
      [--samples=3]
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
    samples = 3
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--samples="):
            samples = int(a.split("=", 1)[1])
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

    def run_stream():
        from concurrent.futures import ThreadPoolExecutor

        labs = [None] * repeats

        def channels():
            for i, b in enumerate(frames_bgr):
                lab = bgr_to_lab_u8_np(b)
                labs[i] = lab
                yield lab[..., 0].astype(np.float32)

        out = [None] * repeats

        def _edit(i, flt):
            f = NLEFilter(trained=flt)
            f.seed_lab_cache(frames_bgr[i], labs[i])
            return f.enhance(frames_bgr[i], weights)

        with ThreadPoolExecutor(4) as ex:
            futs = [
                ex.submit(lambda i=i, flt=flt: out.__setitem__(
                    i, _edit(i, flt)))
                for i, flt in enumerate(
                    train_filters_iter(channels(), *params))
            ]
            for f in futs:
                f.result()
        assert all(o is not None for o in out)
        return out

    variants = ("off", "on")
    for v in variants:          # warmup/compile both
        os.environ["NLE_SB_TRI"] = v
        run_stream()
    results = {v: [] for v in variants}
    for _ in range(samples):
        for v in variants:      # interleaved
            os.environ["NLE_SB_TRI"] = v
            t0 = time.perf_counter()
            run_stream()
            dt = time.perf_counter() - t0
            mps = repeats * mp / dt
            results[v].append(mps)
            print(json.dumps({"sb_tri": v, "mps": round(mps, 3)}),
                  flush=True)
    print(json.dumps({
        "summary": {v: {"best": round(max(r), 3),
                        "all": [round(x, 3) for x in r]}
                    for v, r in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
