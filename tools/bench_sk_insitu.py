"""IN-SITU Sinkhorn halfstep slope test: reproduce the stage-2a context
(phi produced INSIDE the jit, halfsteps chained by a fori_loop closure)
and measure the marginal cost per halfstep by the K1-vs-K2 slope.

Why this exists: the isolated kernel bench (bench_sk_width.py, entry-param
phi) shows the packed-int16 stream 1.64x faster than f32, yet the full
stage 2a runs at exactly f32 wall with every carrier. This harness strips
stage 2a down to "build the carrier in-jit, loop halfsteps" — if the f32
wall reproduces here, the spoiler is in this structure (layout copies on
the custom-call operand, loop-carried relayouts, scheduling), not in the
rest of the stage. Each variant also dumps its optimized HLO around the
custom call so the copies are visible, not inferred.

Usage: cd /root/repo && python tools/bench_sk_insitu.py [--k1=12 --k2=36]
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=12)
    ap.add_argument("--k2", type=int, default=36)
    ap.add_argument("--npad", type=int, default=999424)
    ap.add_argument("--mpad", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--hlo", action="store_true",
                    help="print optimized-HLO lines near the custom calls")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        _packed_chunk, sinkhorn_halfstep_manual)

    enable_persistent_cache()
    npad, mpad = args.npad, args.mpad
    rng = np.random.default_rng(0)
    base = rng.uniform(0.05, 1.0, size=(npad, mpad)).astype(np.float32)
    decades = 10.0 ** rng.uniform(-6, 3, size=(mpad,)).astype(np.float32)
    phi_host = (base * decades[None, :]).astype(np.float32)
    t0_host = rng.uniform(0.5, 2.0, size=(mpad,)).astype(np.float32)

    def chain_f32(phi, t0, K):
        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(phi, t, 1e-10, chunk=1024)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    def chain_f32_injit(phi, t0, K):
        # Carrier PRODUCED inside the jit (like the real stage 2a, where
        # phi comes out of the affinity builder): separates "jit-internal
        # buffer layout" from "entry-param layout" for the f32 baseline.
        phi2 = phi * jnp.float32(1.000001)

        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(phi2, t, 1e-10, chunk=1024)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    def _pack_host(phi):
        colmax = np.abs(phi).max(axis=0)
        scale = np.where(colmax > 0, colmax / 32767.0, 1.0)
        qf = np.clip(np.round(phi / scale[None, :]), -32767, 32767)
        nh = phi.shape[0] // 2
        return (qf[:nh].astype(np.int32) & 0xFFFF) | (
            qf[nh:].astype(np.int32) << 16)

    def chain_packed_entry(q32, t0, K):
        # The packed s32 carrier as an ENTRY PARAM (packed on the host):
        # XLA honors the kernel's untiled layout request exactly like the
        # isolated width bench did for bare s16. Fast here + slow in
        # chain_packed => the spoiler is the jit-internal buffer; slow
        # here too => the packed kernel itself (unpack VPU work / 4 dots)
        # is the wall.
        chunk_q = _packed_chunk(1024, npad // 2, mpad)

        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(q32, t, 1e-10, chunk=chunk_q)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    def chain_packed(phi, t0, K):
        colmax = jnp.max(jnp.abs(phi), axis=0)
        scale = jnp.where(colmax > 0, colmax / 32767.0, 1.0)
        qf = jnp.clip(jnp.round(phi / scale[None, :]), -32767, 32767)
        nh = npad // 2
        q32 = (jnp.bitwise_and(qf[:nh].astype(jnp.int32), 0xFFFF)
               | (qf[nh:].astype(jnp.int32) << 16))
        chunk_q = _packed_chunk(1024, nh, mpad)

        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(q32, t, 1e-10, chunk=chunk_q)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    def chain_packed_barrier(phi, t0, K):
        # jit-internal carrier, but forced through an optimization_barrier
        # before the loop: tests whether fencing the producer changes the
        # layout XLA carries into the custom call.
        colmax = jnp.max(jnp.abs(phi), axis=0)
        scale = jnp.where(colmax > 0, colmax / 32767.0, 1.0)
        qf = jnp.clip(jnp.round(phi / scale[None, :]), -32767, 32767)
        nh = npad // 2
        q32 = (jnp.bitwise_and(qf[:nh].astype(jnp.int32), 0xFFFF)
               | (qf[nh:].astype(jnp.int32) << 16))
        q32 = jax.lax.optimization_barrier(q32)
        chunk_q = _packed_chunk(1024, nh, mpad)

        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(q32, t, 1e-10, chunk=chunk_q)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    def chain_bf16(phi, t0, K):
        phi_bf = phi.astype(jnp.bfloat16)

        def body(_, st):
            t, acc = st
            x, s = sinkhorn_halfstep_manual(phi_bf, t, 1e-10, chunk=2048)
            return s * 1e-3 + t0, acc + x[0]
        t, acc = jax.lax.fori_loop(0, K, body, (t0, jnp.float32(0)))
        return t[0] + acc

    # --- bisection variants: the real stage2a slope (bench_insitu_stage)
    # shows packed at 4.28 vs f32 3.62 ms/halfstep while the stripped
    # variants above show 1.73 vs 3.39. The candidates for the spoiler are
    # the pieces of sinkhorn_vectors_fused's real loop the stripped chain
    # drops: the loop-carried full x vector (forces the in-loop slice +
    # concatenate extraction live, T(1,128)-layout fusions over the 32 MB
    # x buffer), and the two-halfstep body. Each variant adds one.

    def chain_packed_carry(phi, t0, K):
        # Carry the reassembled (2*nh,) x in the loop state — the
        # extraction fusions can no longer be DCE'd.
        colmax = jnp.max(jnp.abs(phi), axis=0)
        scale = jnp.where(colmax > 0, colmax / 32767.0, 1.0)
        qf = jnp.clip(jnp.round(phi / scale[None, :]), -32767, 32767)
        nh = npad // 2
        q32 = (jnp.bitwise_and(qf[:nh].astype(jnp.int32), 0xFFFF)
               | (qf[nh:].astype(jnp.int32) << 16))
        chunk_q = _packed_chunk(1024, nh, mpad)

        def body(_, st):
            t, xc = st
            x, s = sinkhorn_halfstep_manual(q32, t, 1e-10, chunk=chunk_q)
            return s * 1e-3 + t0, x
        t, xc = jax.lax.fori_loop(
            0, K, body, (t0, jnp.zeros((npad,), jnp.float32)))
        return t[0] + xc[0]

    def chain_f32_carry(phi, t0, K):
        def body(_, st):
            t, xc = st
            x, s = sinkhorn_halfstep_manual(phi, t, 1e-10, chunk=1024)
            return s * 1e-3 + t0, x
        t, xc = jax.lax.fori_loop(
            0, K, body, (t0, jnp.zeros((npad,), jnp.float32)))
        return t[0] + xc[0]

    def chain_svf_int16(phi, t0, K):
        # The REAL sinkhorn_vectors_fused int16 section verbatim (env must
        # be NLE_SINKHORN_INT16=on for this variant to mean anything —
        # checked below). Isolates "everything inside sinkhorn_vectors_
        # fused" from "the rest of stage 2a".
        from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused
        lam = jnp.abs(t0) + 0.5
        r, c = sinkhorn_vectors_fused(phi, lam, K, 1e-10)
        return r[0] + c[0]

    variants = [("f32", chain_f32), ("f32_injit", chain_f32_injit),
                ("packed_s32", chain_packed),
                ("packed_s32_entry", chain_packed_entry),
                ("packed_s32_barrier", chain_packed_barrier),
                ("bf16", chain_bf16),
                ("packed_s32_carry", chain_packed_carry),
                ("f32_carry", chain_f32_carry),
                ("svf_env", chain_svf_int16)]
    only = os.environ.get("NLE_INSITU_ONLY")
    if only:
        names = set(only.split(","))
        variants = [v for v in variants if v[0] in names]
    phi_dev = jnp.asarray(phi_host)
    q32_dev = jnp.asarray(_pack_host(phi_host))
    t0_dev = jnp.asarray(t0_host)
    results = {}
    for name, fn in variants:
        if name == "packed_s32_entry":
            phi_arg = q32_dev
        else:
            phi_arg = phi_dev
        walls = {}
        for K in (args.k1, args.k2):
            jitted = jax.jit(fn, static_argnames=("K",))
            lowered = jitted.lower(phi_arg, t0_dev, K=K)
            compiled = lowered.compile()
            if args.hlo and K == args.k1:
                txt = compiled.as_text()
                keep = [ln for ln in txt.splitlines()
                        if re.search(r"custom-call|copy|transpose|fusion",
                                     ln)]
                print(f"--- {name} optimized HLO (filtered, K={K}) ---")
                for ln in keep[:60]:
                    print(ln[:240])
                sys.stdout.flush()
            float(jitted(phi_arg, t0_dev, K=K))  # warm
            best = np.inf
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(jitted(phi_arg, t0_dev, K=K))  # scalar fetch forces
                best = min(best, time.perf_counter() - t0)
            walls[K] = best
        slope_ms = (walls[args.k2] - walls[args.k1]) / (
            args.k2 - args.k1) * 1e3
        results[name] = {
            "wall_k1_s": round(walls[args.k1], 4),
            "wall_k2_s": round(walls[args.k2], 4),
            "ms_per_halfstep": round(slope_ms, 3),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
