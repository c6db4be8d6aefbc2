"""Fidelity experiment: int16 per-row-scaled phi for the Sinkhorn sweeps.

Question: can the Sinkhorn iterations stream a 2-byte phi WITHOUT the
bf16 fidelity collapse (bird 59->27 dB, rock2 62->24 dB — see
ops/pallas/sinkhorn_kernel.py _resolve_bf16_iters)? bf16's failure mode
is per-ELEMENT relative error 2^-9; an int16 copy with a per-ROW scale
(q = round(phi / (rowmax/32767))) has per-element ABSOLUTE error
<= rowmax * 2^-16, and the scale factors out of both contractions
EXACTLY:

    w = (diag(s) Q) @ t      = s * (Q @ t)          (scale applied to w)
    z = (diag(s) Q)^T @ x    = Q^T @ (s * x)        (scale folded into x)

so the kernel streams int16, converts to f32 once per tile, and applies
the scale on the tiny (N,)/(m,) vectors — the only approximation is the
quantization itself, ~2^7 smaller (relative to the row max) than bf16's.

This script runs the REAL pipeline (NLEFilter) on CPU with
ops.pipeline's sinkhorn_vectors monkeypatched to use the
quantize->dequantize phi inside the balancing loop (ALL iterations; the
rest of the pipeline keeps the exact f32 phi), and reports golden PSNR
vs the unpatched run on the chaos-sensitive configs. Decision rule:
every config must hold >= 45 dB with margin comparable to f32.

Usage:  python tools/exp_int16_sinkhorn.py [--configs=bird,rock2]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nle_tpu.golden_configs import DATA_DIR, ENHANCE_CONFIGS  # noqa: E402
from nle_tpu.ops.linalg import safe_reciprocal  # noqa: E402


def _quantize(phi, mode):
    """Quantize phi ~ diag(sr) Q diag(sc) with int16 Q; both scales factor
    out of the Sinkhorn matvecs EXACTLY (column scale merges into lam,
    row scale is an N-vector elementwise op), so the only approximation
    is the per-element rounding. Returns (Q, sr, sc).

    Row-only scaling fails catastrophically (measured 4.8 dB on bird):
    phi's COLUMNS carry the Nystrom 1/lam_j factor — ~10 orders of
    magnitude across columns — so a row max is dominated by the tiny-lam
    columns and rounding destroys the large-lam columns that dominate
    W = phi lam phi^T. Column scaling removes that axis; one extra
    row-equilibration pass tightens the remaining spread."""
    n = phi.shape[0]
    ones_n = jnp.ones((n,), phi.dtype)
    if mode == "col":
        sc = jnp.max(jnp.abs(phi), axis=0)
        sr = ones_n
        q = phi / jnp.where(sc > 0, sc, 1.0)[None, :]
    elif mode == "rowcol":
        # One sqrt-equilibration sweep then a column max:
        a = jnp.abs(phi)
        rmax = jnp.sqrt(jnp.max(a, axis=1, keepdims=True))
        sr = jnp.where(rmax > 0, rmax, 1.0)[:, 0]
        b = a / sr[:, None]
        sc = jnp.max(b, axis=0)
        q = phi / sr[:, None] / jnp.where(sc > 0, sc, 1.0)[None, :]
    else:
        raise ValueError(mode)
    q = jnp.clip(jnp.round(q * 32767.0), -32767, 32767)  # int16 values
    return q, sr, jnp.where(sc > 0, sc, 0.0) / 32767.0


def make_sinkhorn_int16(mode):
    def sinkhorn_vectors_int16(phi, lam, max_iter, eps):
        n = phi.shape[0]
        q, sr, sc = _quantize(phi, mode)
        lam_eff = lam * sc * sc   # column scale merges into lam

        r0 = jnp.ones((n,), dtype=phi.dtype)
        c0 = jnp.zeros((n,), dtype=phi.dtype)

        def w_matvec(x):
            t = lam_eff * (q.T @ (sr * x))
            return sr * (q @ t)

        def body(_, rc):
            r, c = rc
            c = safe_reciprocal(w_matvec(r), eps)
            r = safe_reciprocal(w_matvec(c), eps)
            return (r, c)

        return jax.lax.fori_loop(0, max_iter, body, (r0, c0))

    return sinkhorn_vectors_int16


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def run(configs):
    import nle_tpu.ops.pipeline as P
    from nle_tpu.golden_configs import (
        DENOISE_CONFIG,
        DENOISE_GOLDEN,
        EXTENDED_RECIPES,
        extended_golden_path,
    )
    from nle_tpu.models.filter import NLEFilter

    jobs = [(name, os.path.join(DATA_DIR, inp),
             os.path.join(DATA_DIR, goldf), params, weights, None)
            for name, inp, goldf, params, weights in ENHANCE_CONFIGS]
    jobs += [(name, os.path.join(DATA_DIR, inp), extended_golden_path(name),
              params, weights, None)
             for name, inp, params, weights in EXTENDED_RECIPES]
    dname, dinp, dparams, dsigmas = DENOISE_CONFIG
    jobs += [(dname, os.path.join(DATA_DIR, dinp), DENOISE_GOLDEN,
              dparams, None, dsigmas)]

    rows = []
    for name, inp, goldp, params, weights, sigmas in jobs:
        if configs and name not in configs:
            continue
        img = cv2.imread(inp)
        gold = cv2.imread(goldp)
        nr, nc, hx, hy, iters, k = params
        out = {}
        for mode, fn in (("f32", None),
                         ("col", make_sinkhorn_int16("col"))):
            orig = P.sinkhorn_vectors
            P.sinkhorn_vectors = fn or orig
            # new jit trace per mode: the patched global is baked at trace
            # time, so clear the stage's cache
            P.train_filter_stage2a.clear_cache()
            try:
                t0 = time.time()
                f = NLEFilter()
                if sigmas is not None:
                    sc, ss, shrink = sigmas
                    f.train_for_denoise(img, nr, nc, hx, hy, iters, k,
                                        sigma_color=sc, sigma_space=ss)
                    res = f.denoise(img, shrink, sigma_color=sc,
                                    sigma_space=ss)
                else:
                    f.train_for_enhancement(img, nr, nc, hx, hy, iters, k)
                    res = f.enhance(img, weights)
                out[mode] = (psnr(res, gold), time.time() - t0)
            finally:
                P.sinkhorn_vectors = orig
                P.train_filter_stage2a.clear_cache()
        row = dict(name=name,
                   **{f"psnr_{m}": round(v[0], 2) for m, v in out.items()})
        rows.append(row)
        print(json.dumps(row), flush=True)
    worst = min(min(v for k, v in r.items() if k.startswith("psnr_")
                    and k != "psnr_f32") for r in rows)
    print(json.dumps(dict(summary=True, worst_quantized=worst,
                          passes_gate=bool(worst >= 45.0))))


if __name__ == "__main__":
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--configs="):
            only = set(a.split("=", 1)[1].split(","))
    run(only)
