"""Capacity sweep at the current trajectory (VERDICT r4 #3): which path
auto-dispatches at each size under the defaults, and what it measures.

For each target MP: build the synthetic capacity image (bench_capacity's
generator), record the AUTO path decision (dense-split / streaming /
factored — recomputed from the same byte rules train_filter uses, and
cross-checked against the path actually taken), train + apply once cold
(compile) and once warm, and write one JSON line per size. 64 MP runs the
V-free factored filter (the stored-V product itself exceeds HBM there).
Peak HBM is recorded where the PJRT plugin reports memory_stats (null
through the axon tunnel, documented r3).

  cd /root/repo && python tools/capacity_sweep.py [--sizes=1,4,16,64]
      [--iters=50] [--out=CAPACITY_r05.json]

Answers the reference's stated memory wall (reference README.md:96; the
rock2 'requires a lot of memory' case README.md:82) with measured
single-chip numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def capacity_image(mp):
    side = int(np.sqrt(mp * 1e6))
    H = W = side
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H // 16 + 2, W // 16 + 2)).astype(np.float32)
    chan = np.kron(base, np.ones((16, 16), np.float32))[:H, :W]
    return np.clip(chan + rng.normal(0, 8, (H, W)), 0, 255).astype(np.float32)


def main():
    sizes = (1.0, 4.0, 16.0, 64.0)
    iters = 50
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--sizes="):
            sizes = tuple(float(x) for x in a.split("=", 1)[1].split(","))
        elif a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
    import jax
    import jax.numpy as jnp

    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_fits_vmem
    from nle_tpu.ops.pallas.sinkhorn_kernel import padded_shape
    from nle_tpu.ops.pipeline import (
        _CPHI_BYTES_LIMIT,
        _STREAM_BYTES_LIMIT,
        bucket_m,
    )

    nr, nc, hx, hy, k_eig = 24, 25, 5000.0, 30.0, 50
    p = nr * nc
    rows = []
    for mp in sizes:
        chan = capacity_image(mp)
        H, W = chan.shape
        n = H * W
        mb = bucket_m(p, p)     # worst case: full-rank spectrum
        npad_, mpad_ = padded_shape(n, mb)
        phi_bytes = 4 * npad_ * mpad_
        # The same auto rules ops/pipeline.py applies (r4 defaults):
        streaming_auto = (phi_bytes > _STREAM_BYTES_LIMIT
                          or (phi_bytes > _CPHI_BYTES_LIMIT
                              and not scaled_fits_vmem(mpad_)))
        # Stored V on TPU is T(8,128)-tiled: the minor dim pads to 128
        # lanes, so any k <= 128 costs 512 B/pixel (the layout tax the
        # r5 16 MP OOM exposed — see _stage2b_streaming_body).
        v_bytes = n * max(4 * k_eig, 512 if k_eig <= 128 else 0)
        factored = v_bytes + 12 * n > 12 * 2**30   # stored V + features
        path = ("factored" if factored
                else "streaming" if streaming_auto else "dense-split")
        print(f"-- {mp:g} MP ({H}x{W}): predicted path {path} "
              f"(phi {phi_bytes/2**30:.1f} GiB, V {v_bytes/2**30:.1f} GiB)",
              flush=True)

        # The PRODUCT path (NLEFilter): packed-order eigvecs + host
        # permute — the device (N, k) scatter the library never uses
        # fails with RESOURCE_EXHAUSTED through the axon plugin at
        # N = 1M (found by this sweep; train_filter(pixel_order=True)
        # is a small-image/test convenience only).
        from nle_tpu.models.filter import NLEFilter

        chan_u8 = np.clip(np.rint(chan), 0, 255).astype(np.uint8)
        img_bgr = np.repeat(chan_u8[:, :, None], 3, axis=2)
        weights = list(np.linspace(1.0, 1.5, 4))

        def run():
            t0 = time.time()
            f = NLEFilter(**({"factored": True}
                             if path == "factored" else {}))
            f.train_for_enhancement(img_bgr, nr, nc, hx, hy,
                                    n_sinkhorn_iter=iters,
                                    n_eigen_vectors=k_eig)
            t = f.trained
            probe = t.v_head if hasattr(t, "v_head") else t.eigvecs
            np.asarray(probe[:1, :1])   # force async builds
            t1 = time.time()
            out = f.enhance(img_bgr, weights)
            t2 = time.time()
            return t1 - t0, t2 - t1, float(np.mean(out))

        tr_c, ap_c, _ = run()
        tr_w, ap_w, mean = run()
        stats = None
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                stats = {k: int(v) for k, v in stats.items()
                         if "bytes" in k}
        except Exception:
            stats = None
        row = {
            "mp": mp, "shape": [H, W], "path": path,
            "phi_gib": round(phi_bytes / 2**30, 2),
            "train_s_cold": round(tr_c, 1), "apply_s_cold": round(ap_c, 1),
            "train_s": round(tr_w, 1), "apply_s": round(ap_w, 1),
            "mps": round(mp / (tr_w + ap_w), 3),
            "out_mean": round(mean, 1),
            "peak_hbm": stats,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"params": [nr, nc, hx, hy, iters, k_eig],
                       "defaults": "r5 (int16 carrier + split stage 2a)",
                       "rows": rows}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
