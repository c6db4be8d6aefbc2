"""Run the README golden configuration suite and report PSNR vs the
reference's shipped outputs (BASELINE.md table). Usage:

    python tools/golden_sweep.py [--platform=cpu|axon] [--precision=float64]
                                 [--configs=a,b] [--out=FILE.jsonl]
                                 [--extended]

--extended appends the links.md historical recipes (EXTENDED_RECIPES),
gated against their cached f64 oracle anchors in tools/golden_cache/ —
the same anchors the opt-in pytest gate uses, so the TPU snapshot
(GOLDEN_TPU_EXTENDED.jsonl) and the CPU gate measure the same thing.

Configs live in nle_tpu.golden_configs (shared with the enforced pytest
gate, tests/test_golden.py, so the snapshot and the gate cannot drift).
--out writes the same JSON lines to FILE (used to refresh GOLDEN_TPU.jsonl
in the same run that validates the gate).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nle_tpu.golden_configs import (  # noqa: E402
    DATA_DIR as DATA,
    DENOISE_CONFIG,
    DENOISE_GOLDEN,
    ENHANCE_CONFIGS as CONFIGS,
)


def main():
    platform = "cpu"
    precision = "float32"
    only = None
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        elif a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        elif a.startswith("--configs="):
            only = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    if "--denoise-golden-only" in sys.argv:
        only = {"taj-denoise"}
    if "--extended-golden-only" in sys.argv:
        # Generate the links.md recipes' f64 ORACLE outputs into the cache
        # (nle_tpu.golden_configs EXTENDED_RECIPES) — pure numpy, no jax
        # config needed. These are committed as stored regression anchors;
        # re-running overwrites only missing files.
        import cv2

        import oracle_numpy as O
        from nle_tpu.golden_configs import (
            EXTENDED_RECIPES,
            extended_golden_path,
        )

        for name, inp, params, weights in EXTENDED_RECIPES:
            path = extended_golden_path(name)
            if os.path.exists(path):
                continue
            img = cv2.imread(os.path.join(DATA, inp))
            t0 = time.time()
            out = O.enhance_image(img, *params, weights)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            cv2.imwrite(path, out)
            print(json.dumps(dict(note=f"wrote {path}",
                                  sec=round(time.time() - t0, 1))),
                  flush=True)
        return

    import jax

    jax.config.update("jax_platforms", platform)
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    if precision == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import oracle_numpy as O
    from nle_tpu.models.filter import NLEFilter

    dtype = jnp.float64 if precision == "float64" else jnp.float32
    import cv2

    out_file = open(out_path, "w") if out_path else None

    def emit(row):
        line = json.dumps(row)
        print(line, flush=True)
        if out_file:
            out_file.write(line + "\n")
            out_file.flush()

    jobs = [(name, inp, os.path.join(DATA, goldf), params, weights)
            for name, inp, goldf, params, weights in CONFIGS]
    if "--extended" in sys.argv:
        from nle_tpu.golden_configs import (
            EXTENDED_RECIPES,
            extended_golden_path,
            generate_extended_goldens,
        )

        generate_extended_goldens()
        jobs += [(name, inp, extended_golden_path(name), params, weights)
                 for name, inp, params, weights in EXTENDED_RECIPES]

    results = []
    for name, inp, goldp, params, weights in jobs:
        if only and name not in only:
            continue
        img = cv2.imread(os.path.join(DATA, inp))
        gold = cv2.imread(goldp)
        nr, nc, hx, hy, iters, k = params

        def run():
            f = NLEFilter(dtype=dtype)
            f.train_for_enhancement(img, nr, nc, hx, hy, iters, k)
            return f.enhance(img, weights)

        # Two passes: the first eats any compile (minutes on a fresh
        # shape through the remote-compile service) and is recorded
        # separately; `sec`/`mp_per_s` report the WARM second pass only —
        # the old single-pass timing mixed compile into the throughput
        # column and made flower look like 0.001 MP/s (VERDICT r3 #6).
        t0 = time.time()
        run()
        first = time.time() - t0
        t0 = time.time()
        out = run()
        dt = time.time() - t0
        ps = O.psnr(out, gold)
        mp = img.shape[0] * img.shape[1] / 1e6
        row = dict(name=name, psnr=round(float(ps), 2), sec=round(dt, 2),
                   sec_first=round(first, 2),
                   mpix=round(mp, 3), mp_per_s=round(mp / dt, 3))
        results.append(row)
        emit(row)

    name, inp, params, dparams = DENOISE_CONFIG
    if not only or name in only:
        img = cv2.imread(os.path.join(DATA, inp))
        nr, nc, hx, hy, iters, k = params
        sigma_color, sigma_space, shrink = dparams
        golden_only = "--denoise-golden-only" in sys.argv
        if not golden_only and not os.path.exists(DENOISE_GOLDEN):
            # Generate the f64 golden once (requires a fresh x64 process).
            import subprocess

            emit(dict(note=f"generating {DENOISE_GOLDEN}"))
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--platform=cpu", "--precision=float64",
                 "--denoise-golden-only"],
                check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        def run_denoise():
            f = NLEFilter(dtype=dtype)
            f.train_for_denoise(img, nr, nc, hx, hy, iters, k,
                                sigma_color, sigma_space)
            return f.denoise(img, shrink, sigma_color, sigma_space)

        t0 = time.time()
        out = run_denoise()
        first = time.time() - t0
        if golden_only:
            os.makedirs(os.path.dirname(DENOISE_GOLDEN), exist_ok=True)
            cv2.imwrite(DENOISE_GOLDEN, out)
            emit(dict(note=f"wrote {DENOISE_GOLDEN}"))
            return
        # Warm second pass for honest timing (same rule as the enhance
        # configs above); PSNR from it too.
        t0 = time.time()
        out = run_denoise()
        dt = time.time() - t0
        gold = cv2.imread(DENOISE_GOLDEN)
        ps = O.psnr(out, gold)
        mp = img.shape[0] * img.shape[1] / 1e6
        row = dict(name=name, psnr=round(float(ps), 2), sec=round(dt, 2),
                   sec_first=round(first, 2),
                   mpix=round(mp, 3), mp_per_s=round(mp / dt, 3))
        results.append(row)
        emit(row)

    if results:
        worst = min(r["psnr"] for r in results)
        emit(dict(summary=True, worst_psnr=worst,
                  mean_psnr=round(
                      sum(r["psnr"] for r in results) / len(results), 2)))
    if out_file:
        out_file.close()


if __name__ == "__main__":
    main()
