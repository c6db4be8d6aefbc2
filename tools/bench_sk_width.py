"""Isolate the Sinkhorn halfstep kernel's realized HBM rate per element
width at the headline stream shape (npad=999424, mpad=640 — the 1 MP
p=600 serving/bench configuration).

Question this answers: the int16 per-column-scaled stream halves the
bytes of the pipeline's dominant stage, yet the end-to-end TPU A/B
measured NO wall-time win (1.76-1.78 MP/s int16 vs 1.79 f32). Either
(a) 2-byte DMA streams do not sustain the 4-byte BYTE rate on this chip
(half the bytes, half the rate => same wall), or (b) the DMA chunk size
is the lever (the VMEM-safe int16 chunk at mpad=640 is 1024, same as
f32, because the in-kernel f32 conversion temps eat the frame budget —
while bf16 fits a 2048 chunk). The four timings below separate the two:

    f32   chunk=1024   baseline byte rate
    bf16  chunk=1024   same chunk, half the bytes  -> tests (a)
    bf16  chunk=2048   doubled chunk, half bytes   -> tests (b)
    int16 chunk=1024   the VMEM-safe quantized stream as shipped

Each variant runs K dependent halfsteps inside one jit (s feeds the next
t), so dispatch and tunnel latency amortize away; timing forces a scalar
fetch (jax.block_until_ready may return early through the axon tunnel).
Effective GB/s = K * npad * mpad * width / wall.

Run on a QUIET machine (one TPU job at a time; the single host core also
serves the pipeline's f64 islands in real runs).

Usage: cd /root/repo && python tools/bench_sk_width.py [--iters=24]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24,
                    help="halfsteps per timed call (dependency-chained)")
    ap.add_argument("--npad", type=int, default=999424)
    ap.add_argument("--mpad", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_halfstep_manual

    enable_persistent_cache()
    npad, mpad = args.npad, args.mpad
    rng = np.random.default_rng(0)
    # Affinity-like positive factor; column scales spanning decades like
    # the Nystrom 1/lam structure (irrelevant for timing, keeps values
    # finite through K reciprocal sweeps).
    phi32 = (np.abs(rng.standard_normal((npad, mpad))).astype(np.float32)
             * 0.3 + 0.05)
    lam = np.linspace(1.0, 0.2, mpad).astype(np.float32)

    def chain(phi, k):
        lam_d = jnp.asarray(lam)

        @jax.jit
        def run(p, t0):
            def body(_, st):
                t, acc = st
                x, s = sinkhorn_halfstep_manual(p, t, 1e-10, chunk=chunk)
                return lam_d * s, acc + x[0]
            t, acc = jax.lax.fori_loop(0, k, body,
                                       (t0, jnp.float32(0.0)))
            return acc  # scalar: forces real completion through the tunnel
        return run

    t0 = np.ones((mpad,), np.float32)
    results = []
    cases = [
        ("f32", jnp.float32, 1024),
        ("bf16", jnp.bfloat16, 1024),
        ("bf16", jnp.bfloat16, 2048),
        ("int16", jnp.int16, 1024),
    ]
    for name, dtype, chunk in cases:
        if dtype == jnp.int16:
            colmax = np.abs(phi32).max(axis=0)
            q = np.clip(np.round(phi32 / (colmax / 32767.0)[None, :]),
                        -32767, 32767).astype(np.int16)
            phi_dev = jax.device_put(q)
            width = 2
        else:
            phi_dev = jax.device_put(phi32.astype(dtype))
            width = np.dtype(dtype).itemsize
        run = chain(phi_dev, args.iters)
        float(run(phi_dev, jnp.asarray(t0)))  # compile + warm
        best = 1e9
        for _ in range(args.repeats):
            w0 = time.perf_counter()
            float(run(phi_dev, jnp.asarray(t0)))
            best = min(best, time.perf_counter() - w0)
        swept = args.iters * npad * mpad * width
        rec = {"variant": name, "chunk": chunk, "width_bytes": width,
               "halfstep_ms": round(1e3 * best / args.iters, 3),
               "eff_GBps": round(swept / best / 1e9, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = next(r for r in results if r["variant"] == "f32")
    for r in results:
        r["wall_vs_f32"] = round(r["halfstep_ms"] / base["halfstep_ms"], 3)
    print(json.dumps({"shape": [npad, mpad], "iters": args.iters,
                      "summary": results}))


if __name__ == "__main__":
    main()
