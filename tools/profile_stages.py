"""Wall-clock breakdown of the enhance pipeline on the current backend,
via the model layer (exactly what bench.py runs) with stage DEBUG logs.

Usage: python tools/profile_stages.py [--platform=cpu] [--mp=1.0]
[--config=nr,nc,hx,hy,iters,k]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    platform = None
    mp = 1.0
    cfg = (20, 30, 500.0, 10.0, 50, 50)
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            platform = a.split("=", 1)[1]
        elif a.startswith("--mp="):
            mp = float(a.split("=", 1)[1])
        elif a.startswith("--config="):
            cfg = tuple(float(x) for x in a.split("=", 1)[1].split(","))
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()

    logging.basicConfig(level=logging.DEBUG,
                        format="%(relativeCreated)8.0fms %(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)

    from bench_input import load_input
    from nle_tpu.models.filter import NLEFilter

    img = load_input(mp)
    h, w = img.shape[:2]
    nr, nc, hx, hy, iters, k = (int(cfg[0]), int(cfg[1]), cfg[2], cfg[3],
                                int(cfg[4]), int(cfg[5]))
    weights = [4.0, 3.0, 4.0, 1.0]
    print(f"image {w}x{h} = {h*w/1e6:.3f} MP, config {cfg}", flush=True)

    def run():
        f = NLEFilter()
        t0 = time.perf_counter()
        f.train_for_enhancement(img, nr, nc, hx, hy, iters, k)
        t1 = time.perf_counter()
        out = f.enhance(img, weights)
        t2 = time.perf_counter()
        print(f"  train {1e3*(t1-t0):8.1f} ms   enhance {1e3*(t2-t1):8.1f} ms"
              f"   total {1e3*(t2-t0):8.1f} ms -> {h*w/1e6/(t2-t0):.3f} MP/s",
              flush=True)

    run()  # compile warmup
    for _ in range(3):
        run()


if __name__ == "__main__":
    main()
