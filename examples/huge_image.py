"""Megapixel+ editing via the phi-free streaming stage 2.

The reference is limited to ~O(100)x O(100) images (reference README.md:7,96:
O(kN) dense intermediates). The dense TPU pipeline lifts that to ~5 MP per
chip; beyond it, train_filter auto-switches to the streaming stage 2
(ops/pallas/streaming_kernel.py) — O(N) memory, ~50 MP per chip.

    python examples/huge_image.py <image> <out> [--mp=8] [--force-streaming]
                                  [--platform=cpu]

The input is upscaled to the requested size; with --force-streaming the
streaming path runs regardless of size (useful to compare both paths).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if len(args) > 0 else "/root/reference/data/rock2.jpg"
    dst = args[1] if len(args) > 1 else "/tmp/huge-enhanced.png"
    target_mp = 8.0
    force = False
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            target_mp = float(a.split("=", 1)[1])
        elif a == "--force-streaming":
            force = True
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])

    import cv2

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.models.filter import NLEFilter

    enable_persistent_cache()
    from nle_tpu.utils.imageio import imread_bgr

    img = imread_bgr(src)   # raises FileNotFoundError on a bad path
    h, w = img.shape[:2]
    scale = (target_mp * 1e6 / (h * w)) ** 0.5
    img = cv2.resize(img, (int(w * scale), int(h * scale)),
                     interpolation=cv2.INTER_CUBIC)
    mp = img.shape[0] * img.shape[1] / 1e6
    print(f"{img.shape[1]}x{img.shape[0]} = {mp:.1f} MP", flush=True)

    kwargs = {"streaming": True} if force else {}
    f = NLEFilter(**kwargs)
    t0 = time.time()
    f.train_for_enhancement(img, 24, 25, hx=5000, hy=30,
                            n_sinkhorn_iter=50, n_eigen_vectors=50)
    # Force the async stage-2b eigvec build before stamping the split (a
    # scalar fetch; plain block_until_ready can return early on axon).
    np.asarray(f.trained.eigvecs[:1, :1])
    t1 = time.time()
    out = f.enhance(img, [2, 3, 3, 1])
    t2 = time.time()
    from nle_tpu.utils.imageio import imwrite_bgr

    imwrite_bgr(dst, out)   # raises on write failure (cv2.imwrite only
    #                         returns False — a silent no-op otherwise)
    print(f"train {t1-t0:.1f}s  enhance {t2-t1:.1f}s  "
          f"-> {mp/(t2-t0):.2f} MP/s  wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
