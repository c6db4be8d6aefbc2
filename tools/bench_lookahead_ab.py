"""Same-session interleaved A/B of the stream lookahead depth
(VERDICT r5 lever: 2-frame lookahead takes tunnel round-trip latency off
the critical path; memory permits ~3 phis at 1 MP).

Runs bench.py's exact stream schedule with train_filters_iter(lookahead=L)
alternating A B A B … in ONE process (same compiled programs — only the
submission schedule differs), so tunnel-load drift cannot masquerade as a
win. Prints one JSON line per pass plus the summary.

  cd /root/repo && python tools/bench_lookahead_ab.py [--mp=1.0]
      [--repeats=8] [--samples=3] [--la=1,2]
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
    las = (1, 2)
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--samples="):
            samples = int(a.split("=", 1)[1])
        elif a.startswith("--la="):
            las = tuple(int(x) for x in a.split("=", 1)[1].split(","))
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

    def run_stream(look):
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
                    train_filters_iter(channels(), *params,
                                       lookahead=look))
            ]
            for f in futs:
                f.result()
        assert all(o is not None for o in out)
        return out

    ref = None
    for look in las:
        outs = run_stream(look)    # warmup/compile + output parity
        if ref is None:
            ref = outs
        else:
            worst = max(np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
                        for a, b in zip(ref, outs))
            print(json.dumps({"la": look, "max_abs_diff_vs_first": int(worst)}),
                  flush=True)

    results = {la: [] for la in las}
    for _ in range(samples):
        for look in las:            # interleaved A B A B
            t0 = time.perf_counter()
            run_stream(look)
            dt = time.perf_counter() - t0
            mps = repeats * mp / dt
            results[look].append(mps)
            print(json.dumps({"la": look, "mps": round(mps, 3)}),
                  flush=True)
    summary = {f"la{la}": {"best": round(max(v), 3),
                           "all": [round(x, 3) for x in v]}
               for la, v in results.items()}
    print(json.dumps({"summary": summary, "mp": round(mp, 3),
                      "repeats": repeats}), flush=True)


if __name__ == "__main__":
    main()
