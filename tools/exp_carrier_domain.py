"""Characterize the int16 Sinkhorn carrier's validity domain and find a
cheap per-column statistic that separates it (VERDICT r4 #2).

The documented failure (ROADMAP r4 carrier note): images that put many
decades of dynamic range inside one phi column — e.g. uniform noise at
small hx — are destroyed by the int16 carrier's ~4.5 decades, while every
real golden image passes with wide margins. The guard needs a statistic
that (a) is computable inside quantize_pack_int16's existing sweep for
~free, and (b) cleanly separates the two populations.

Candidates measured here on f32 phi (what the device quantizes):
  - dead_rows: fraction of REST rows whose every column quantizes to 0
    (|phi_ij| < scale_j/2 for all j). A dead row's balancing weight
    collapses to safe_reciprocal(0) = 0 — the pixel drops out of the
    filter entirely. This is the mechanism of the observed destruction.
  - min_ratio: min over columns of (min nonzero |phi_ij|) / colmax_j —
    the VERDICT's suggested per-column dynamic-range ratio.
  - crushed: overall fraction of nonzero entries quantizing to 0.

Plus ground truth per input: PSNR of the int16-trajectory enhancement vs
the f64 oracle enhancement (the golden gate's measure; carrier simulated
in f64 numpy with per-column int16 quantization — same algebra as
_resolve_int16's docstring).

Run: python tools/exp_carrier_domain.py        (CPU, numpy-only, ~1 min)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_numpy import (  # noqa: E402
    EPS,
    compute_kernel,
    enhance_image,
    inplace_reciprocal,
    nystrom_approximation,
    orthogonalize,
    psnr,
    sinkhorn,
    transform_eigenvalues,
)

REF_DATA = "/root/reference/data"


def quant_stats(phi_b32: np.ndarray) -> dict:
    """The candidate guard statistics on the f32 REST block (what the
    split-buffer/sharded carriers quantize; the assembled path includes
    the top block but its Um entries are orthonormal-column-scale and
    never the extreme)."""
    colmax = np.max(np.abs(phi_b32), axis=0)
    scale = np.where(colmax > 0, colmax / 32767.0, 1.0)
    q = np.round(phi_b32 / scale[None, :])
    nz = phi_b32 != 0
    crushed = float(np.mean((q == 0) & nz)) if nz.any() else 0.0
    dead_rows = float(np.mean(~np.any(q != 0, axis=1)))
    with np.errstate(divide="ignore"):
        amin = np.where(
            nz, np.abs(phi_b32), np.inf).min(axis=0)
    ratio = np.where(colmax > 0, amin / colmax, 1.0)
    min_ratio = float(np.min(ratio))
    return {"dead_rows": dead_rows, "crushed": crushed,
            "min_ratio": min_ratio,
            "colmax_decades": float(np.log10(colmax.max() /
                                             max(colmax.min(), 1e-300)))}


def train_with_carrier(channel, nr, nc, hx, hy, iters, k, quantize: bool):
    """Oracle train, optionally with the int16 per-column carrier
    substituted into the Sinkhorn iterations (f64 elsewhere — isolates
    the carrier's contribution exactly)."""
    perm, Ka, Kab = compute_kernel(channel, nr, nc, hx, hy)
    lam, phi = nystrom_approximation(Ka, Kab)
    if not quantize:
        Wa, Wab = sinkhorn(phi, lam, iters)
    else:
        colmax = np.max(np.abs(phi), axis=0)
        scale = np.where(colmax > 0, colmax / 32767.0, 1.0)
        phi_q = np.round(phi / scale[None, :]).clip(-32767, 32767) \
            * scale[None, :]
        n = phi.shape[0]
        r = np.ones(n)
        c = None
        for _ in range(iters):
            c, _ = inplace_reciprocal(phi_q @ (lam * (phi_q.T @ r)))
            r, _ = inplace_reciprocal(phi_q @ (lam * (phi_q.T @ c)))
        p = phi.shape[1]
        Ga = phi[:p] * lam[None, :]
        Wa = (r[:p, None] * Ga) @ (c[:p, None] * phi[:p]).T
        Wab = (r[:p, None] * Ga) @ (c[p:, None] * phi[p:]).T
    V, S = orthogonalize(Wa, Wab, k)
    Vfull = np.empty_like(V)
    Vfull[perm] = V
    return Vfull, S


def enhance_with(channel, V, S, weights):
    fS = transform_eigenvalues(S, weights)
    out = V @ (fS * (V.T @ channel.reshape(-1)))
    return np.clip(out, 0, 255)


def run_case(name, channel, nr, nc, hx, hy, iters=10, k=4,
             weights=(1.0, 1.1, 1.1, 1.05)):
    perm, Ka, Kab = compute_kernel(channel, nr, nc, hx, hy)
    lam, phi = nystrom_approximation(Ka, Kab)
    p = Ka.shape[0]
    stats = quant_stats(phi[p:].astype(np.float32))
    V0, S0 = train_with_carrier(channel, nr, nc, hx, hy, iters, k, False)
    V1, S1 = train_with_carrier(channel, nr, nc, hx, hy, iters, k, True)
    e0 = enhance_with(channel, V0, S0, weights)
    e1 = enhance_with(channel, V1, S1, weights)
    db = psnr(e0.reshape(channel.shape), e1.reshape(channel.shape))
    print(json.dumps({"case": name, "p": p, "m": int(lam.size),
                      "psnr_int16_vs_f64": round(float(db), 2),
                      **{kk: (round(v, 6) if isinstance(v, float) else v)
                         for kk, v in stats.items()}}))
    return stats, db


def load_L(path):
    import cv2

    img = cv2.imread(path)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    return lab[:, :, 0].astype(np.float64)


def main():
    rng = np.random.default_rng(0)
    # Real golden inputs at their FULL size and exact README configs
    # (the carrier's golden evidence base, exp_int16_sinkhorn r3).
    from nle_tpu.golden_configs import ENHANCE_CONFIGS

    for name, fname, _, (nr, nc, hx, hy, iters, k), weights in \
            ENHANCE_CONFIGS:
        L = load_L(os.path.join(REF_DATA, fname))
        run_case(name, L, nr, nc, hx, hy, iters=iters, k=k,
                 weights=weights)

    # The failure domain: uniform noise, small hx (spatial scale ~ a few
    # pixels -> Kab entries span exp(-d^2/hx^2) over the whole image's
    # distances -> many decades inside each phi column). Same iter/k
    # class as the real configs.
    for hx in (3.0, 5.0, 10.0, 30.0):
        noise = rng.uniform(0, 255, size=(120, 120))
        run_case(f"uniform-noise-hx{hx:g}", noise, 10, 10, hx, 30.0,
                 iters=50, k=20, weights=(2.0, 3.0, 4.0, 1.0))


if __name__ == "__main__":
    main()
