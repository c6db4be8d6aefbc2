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

    # L-channel values are O(100); 0.05 is the streaming-association noise
    # bound used by tests/test_factored.py on CPU.
    ok = (s_diff < 1e-3 and edit_diff < 0.2 and fact_diff < 0.2
          and np.isfinite(v_diff))
    print(json.dumps({
        "check": "tpu_sharded_pallas", "platform": platform,
        "mesh": [1, 1], "s_diff": s_diff, "v_absdiff": v_diff,
        "edit_diff": edit_diff, "factored_edit_diff": fact_diff,
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
