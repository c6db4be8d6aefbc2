"""Dump the optimized HLO of the FAST harness variant (verbatim
sinkhorn_vectors_fused, entry-param phi — 1.70 ms/halfstep) for diffing
against dump_stage2a_hlo.py's real-stage while body (4.02 ms/halfstep).

Usage: cd /root/repo && NLE_SINKHORN_INT16=on python tools/dump_svf_hlo.py
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--npad", type=int, default=999424)
    ap.add_argument("--mpad", type=int, default=640)
    ap.add_argument("--pattern", default=r"custom-call|copy|transpose|while|"
                    r"s32|bitcast|fusion|convert|slice|pad|reduce|mul")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nle_tpu.config import enable_persistent_cache
    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.uniform(0.05, 1.0, (args.npad, args.mpad))
                      .astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.5, 1.5, (args.mpad,)).astype(np.float32))

    def fn(phi, lam, K):
        r, c = sinkhorn_vectors_fused(phi, lam, K, 1e-10)
        return r[0] + c[0]

    jitted = jax.jit(fn, static_argnames=("K",))
    txt = jitted.lower(phi, lam, K=args.iters).compile().as_text()
    if args.all:
        print(txt)
        return 0
    pat = re.compile(args.pattern)
    for ln in txt.splitlines():
        if pat.search(ln):
            print(ln[:300])
    return 0


if __name__ == "__main__":
    sys.exit(main())
