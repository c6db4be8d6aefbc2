"""Real-chip check for the shard_map + Pallas composition.

The sharded trainers are correctness-tested on the 8-device virtual CPU
mesh (tests/test_sharding.py), but those runs use interpret-mode XLA
fallbacks — the actual TPU shard_map+Pallas lowering only executes on real
hardware. This tool runs the streaming sharded trainer (and the factored
variant) on a (1, 1) mesh on the DEFAULT platform — the single real chip
under axon — and asserts the results against the single-chip pipeline, so
the composition is exercised on hardware every round (VERDICT round-1
item 6).

Run from /root/repo (the axon PJRT plugin needs cwd=/root/repo):

    python tools/check_tpu_sharded.py          # one JSON line; rc 0 = ok

On a CPU-only machine this still works (the mesh is whatever the default
platform provides) but proves less; the verify skill runs it on the chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import numpy as np

    # Apples-to-apples: the check validates the SHARDING machinery (psum
    # Sinkhorn, shard_map+Pallas lowering) against the single-chip
    # pipeline. int16 now defaults ON, so pin BOTH sides to the f32
    # stream (same process env): the dense comparison stays bit-exact
    # and mode-independent (the golden sweep gates the quantized mode).
    os.environ.setdefault("NLE_SINKHORN_INT16", "off")
    # Same reasoning for the 3-pass stage-2 GEMM split: the two sides
    # tile their dots differently (XLA vs Pallas), and the split widens
    # that association noise ~2^9 before the chaotic chain amplifies it
    # — pin the exact 6-pass dots so the machinery comparison keeps its
    # tight bounds (the golden sweep gates the high mode's fidelity).
    os.environ.setdefault("NLE_STAGE2_DOTS", "highest")

    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from nle_tpu.models.factored import train_filter_factored
    from nle_tpu.ops.pipeline import apply_filter, train_filter
    from nle_tpu.ops.transform import transform_eigenvalues
    from nle_tpu.parallel.sharded import (
        apply_filter_factored_sharded,
        make_mesh,
        train_filter_sharded,
    )
    from nle_tpu.utils.transfer import fetch

    platform = jax.default_backend()
    # Small real-image problem: big enough to hit the Pallas kernels'
    # tiled paths, small enough that a fresh compile stays in minutes.
    try:
        import cv2

        img = cv2.imread("/root/reference/data/flower-50.bmp")
        chan = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[..., 0]
        chan = chan[:256, :384].astype(np.float32)
    except Exception:
        rng = np.random.default_rng(0)
        chan = rng.integers(0, 256, (256, 384)).astype(np.float32)
    args = (8, 10, 300.0, 30.0, 10, 8)
    weights = [2.0, 3.0, 4.0, 1.0]

    mesh = make_mesh(1, 1)
    batch = chan[None]

    # Single-chip streaming pipeline = the truth to match. N-sized
    # device->host transfers go through the chunked fetch (CLAUDE.md
    # transfer rule), never bare np.asarray.
    V1, S1 = train_filter(chan, *args, streaming=True)
    V1 = fetch(V1)
    S1 = np.asarray(S1)

    # shard_map + Pallas streaming trainer on the (1, 1) device mesh.
    Vs, Ss = train_filter_sharded(batch, *args, mesh, streaming=True)
    Vs = fetch(Vs)[0]
    Ss = np.asarray(Ss[0])
    s_diff = float(np.abs(Ss - S1).max())
    v_diff = float(np.abs(np.abs(Vs) - np.abs(V1)).max())

    fS = transform_eigenvalues(jnp.asarray(S1), weights)
    out1 = fetch(apply_filter(jnp.asarray(V1), fS, jnp.asarray(chan)))
    outs = fetch(apply_filter(jnp.asarray(Vs), fS, jnp.asarray(chan)))
    edit_diff = float(np.abs(outs - out1).max())

    # Factored variant: sharded training + the pixel-sharded V-free apply.
    flts = train_filter_sharded(batch, *args, mesh, streaming=True,
                                factored=True)
    ff1 = train_filter_factored(chan, *args)
    fS_f = transform_eigenvalues(ff1.eigvals, weights)
    out_f1 = ff1.apply(chan, fS_f)
    fS_s = transform_eigenvalues(flts[0].eigvals, weights)
    out_fs = apply_filter_factored_sharded(flts[0], chan, fS_s, mesh)
    fact_diff = float(np.abs(np.asarray(out_fs) - np.asarray(out_f1)).max())

    # Phase 2 (VERDICT r3 item 2): the DENSE sharded trainer's int16
    # carrier A/B on the real chip at the Sinkhorn-dominated bench shape
    # (~1 MP, p=600, 50 iterations — the serving config). Same process,
    # same session: the int16 resolve happens per call and the cached step
    # builders key on the outcome, so flipping the env selects a different
    # compiled program. NLE_STAGE2_DOTS stays pinned highest for both
    # sides (isolates the carrier).
    import time

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_input import load_input

    bgr = load_input(1.0)
    chan1 = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)[..., 0].astype(np.float32)
    qargs = (20, 30, 500.0, 10.0, 50, 50)

    def timed_train(int16: str, iters: int):
        os.environ["NLE_SINKHORN_INT16"] = int16
        walls, out = [], None
        for rep in range(3):   # rep 0 pays any fresh compile
            t0 = time.perf_counter()
            V, S = train_filter_sharded(
                chan1[None], qargs[0], qargs[1], qargs[2], qargs[3],
                iters, qargs[5], mesh)
            np.asarray(S)[0, 0]          # force completion (axon quirk)
            float(np.asarray(V[0, :1, :1]).sum())
            walls.append(time.perf_counter() - t0)
            out = (V, S)
        return min(walls[1:]), out

    # SLOPE timing: the full sharded train's wall is dominated by the
    # ~200 MB V fetch over the tunnel (~40 MB/s => ~5 s) plus the host
    # chain — a direct wall A/B cannot resolve the Sinkhorn stage. The
    # 50-iter-minus-1-iter difference isolates the balancing loop the
    # carrier accelerates (everything else is iteration-count-
    # independent; 1 rather than 0 as the base because a 0-iteration
    # train leaves c = 0 and a degenerate host chain).
    wall_f32_1, _ = timed_train("off", 1)
    wall_f32, (Vf, Sf) = timed_train("off", qargs[4])
    wall_q_1, _ = timed_train("auto", 1)
    wall_q, (Vq, Sq) = timed_train("auto", qargs[4])
    slope_f32 = max(wall_f32 - wall_f32_1, 1e-9)
    slope_q = max(wall_q - wall_q_1, 1e-9)
    os.environ["NLE_SINKHORN_INT16"] = "off"   # leave the pin as phase 1 had it
    fS_q = transform_eigenvalues(jnp.asarray(np.asarray(Sf[0])), weights)
    ef = fetch(apply_filter(jnp.asarray(fetch(Vf)[0]), fS_q,
                            jnp.asarray(chan1)))
    eq = fetch(apply_filter(jnp.asarray(fetch(Vq)[0]), fS_q,
                            jnp.asarray(chan1)))
    q_edit_diff = float(np.abs(eq - ef).max())
    sq_diff = float(np.abs(np.asarray(Sq) - np.asarray(Sf)).max())

    # Carrier bound: the int16 trajectory class is sub-gray-level on real
    # images (golden-gated >= 45 dB elsewhere); hundreds = structural bug.
    ok = (s_diff < 1e-3 and edit_diff < 0.2 and fact_diff < 0.2
          and np.isfinite(v_diff) and q_edit_diff < 5.0 and sq_diff < 0.05)
    print(json.dumps({
        "check": "tpu_sharded_pallas", "platform": platform,
        "mesh": [1, 1], "s_diff": s_diff, "v_absdiff": v_diff,
        "edit_diff": edit_diff, "factored_edit_diff": fact_diff,
        "dense_1mp_wall_f32_s": round(wall_f32, 3),
        "dense_1mp_wall_int16_s": round(wall_q, 3),
        "sinkhorn_slope_f32_s": round(slope_f32, 3),
        "sinkhorn_slope_int16_s": round(slope_q, 3),
        "int16_sinkhorn_speedup": round(slope_f32 / slope_q, 3),
        "int16_edit_diff": q_edit_diff, "int16_s_diff": sq_diff,
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
