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

    def timed_train(int16: str):
        os.environ["NLE_SINKHORN_INT16"] = int16
        walls, out = [], None
        for rep in range(3):   # rep 0 pays any fresh compile
            t0 = time.perf_counter()
            V, S = train_filter_sharded(chan1[None], *qargs, mesh)
            np.asarray(S)[0, 0]          # force completion (axon quirk)
            float(np.asarray(V[0, :1, :1]).sum())
            walls.append(time.perf_counter() - t0)
            out = (V, S)
        return min(walls[1:]), out

    wall_f32, (Vf, Sf) = timed_train("off")
    wall_q, (Vq, Sq) = timed_train("auto")

    # Carrier A/B on the BARE 2a step program with pre-staged device
    # inputs: the full train's 20-second wall (V fetch over the tunnel +
    # host chain) has +-2-3 s run-to-run noise that swamps the ~1 s
    # Sinkhorn signal — an earlier 50-vs-1-iteration slope on full
    # trains measured slope 0.0 for f32 (VERDICT r3 #2's A/B, done
    # honestly). Timing the jitted step alone (scalar-forced) resolves
    # it.
    from nle_tpu.ops.affinity import bandwidth_weights
    from nle_tpu.ops.pipeline import bucket_m, ka_eigh_host64
    from nle_tpu.ops.sampling import sample_grid
    from nle_tpu.parallel import sharded as _sh

    nr2, nc2, hx2, hy2, it2, _k2 = qargs
    grid = sample_grid(chan1.shape[0], chan1.shape[1], nr2, nc2)
    p2 = grid.n_samples
    nb = grid.n_pixels - p2
    Um64, lam64, Uinv64 = ka_eigh_host64(
        chan1[grid.sel_rows, grid.sel_cols].astype(np.float64),
        grid.sel_rows, grid.sel_cols, hx2, hy2, 1e-10)
    m2 = lam64.shape[0]
    mb2 = bucket_m(m2, p2)
    sw2, pw2 = bandwidth_weights(hx2, hy2, np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat = chan1.reshape(-1)[grid.perm].astype(np.float32)
    rr_a = (grid.perm[:p2] // chan1.shape[1]).astype(np.float32)
    cc_a = (grid.perm[:p2] % chan1.shape[1]).astype(np.float32)
    sh_data = NamedSharding(mesh, P("data"))

    def pad_cols(a, arr1d=False):
        padspec = ((0, mb2 - a.shape[-1]),) if arr1d else (
            (0, 0), (0, mb2 - a.shape[-1]))
        return jax.device_put(
            np.pad(a, padspec).astype(np.float32)[None], sh_data)

    Um_g = pad_cols(Um64)
    lam_g = pad_cols(lam64, arr1d=True)
    Uinv_g = pad_cols(Uinv64)
    m_g = jax.device_put(np.array([m2], np.int32), sh_data)
    fa_g = jax.device_put(
        np.stack([rr_a, cc_a, flat[:p2]], -1)[None], sh_data)
    yb = np.zeros((1, nb), np.float32)
    yb[0] = flat[p2:]
    yb_g = jax.device_put(yb, NamedSharding(mesh, P("data", "pixel")))
    fb_g, mask_g = _sh._build_feats_step(mesh, nb, nb)(
        yb_g, *_sh._coord_rest_arrays(grid, mesh, jnp.float32, nb))

    def timed_step(builder):
        step = builder(mesh, p2, mb2, it2, 1e-10, True)
        walls = []
        for rep in range(6):   # rep 0 pays any fresh compile
            t0 = time.perf_counter()
            with jax.default_matmul_precision("highest"):
                out = step(Um_g, lam_g, Uinv_g, m_g, fa_g, fb_g, mask_g,
                           np.float32(sw2), np.float32(pw2))
            float(np.asarray(out[0][0, 0]))   # rp scalar forces the program
            walls.append(time.perf_counter() - t0)
        return min(walls[1:])

    step_f32_s = timed_step(_sh._sharded_2a_step)
    step_q_s = timed_step(_sh._sharded_2a_step_q)
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
        "step2a_f32_s": round(step_f32_s, 3),
        "step2a_int16_s": round(step_q_s, 3),
        "int16_step2a_speedup": round(step_f32_s / step_q_s, 3),
        "int16_edit_diff": q_edit_diff, "int16_s_diff": sq_diff,
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
