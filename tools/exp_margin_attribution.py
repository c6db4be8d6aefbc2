"""Margin attribution for the golden-floor recipes (VERDICT r4 #7).

paper (hx=1000) and brickwall-links (hx=3000) sit ~10 dB under the config
mean on every chip sweep (52.8 vs means 60-70). This decomposes WHERE the
f64->f32-class error enters, by running the f64 oracle with exactly ONE
stage downgraded to f32 per variant and measuring PSNR of the final
enhanced L plane vs the all-f64 baseline:

  phi32       Ka/Kab/phi built in f32 (stage-1 input quality)
  sinkhorn32  the balancing loop run in f32 on f32 phi
  int16       the per-column int16 carrier in the loop (the TPU default)
  chain32     the orthogonalization chain in f32 (the piece the real
              pipeline keeps in f64 ON HOST — its dB shows why)
  apply32     V/fS/apply in f32

A control config (flower, mean-margin class) calibrates what "normal"
per-stage sensitivity looks like. The smallest dB column is the stage
that eats the margin; anything within a few dB of the chip sweep's
52.8 dB explains the floor.

Run: python tools/exp_margin_attribution.py   (CPU, ~2 min)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_numpy import (  # noqa: E402
    compute_kernel,
    eigen_decomposition,
    inplace_reciprocal,
    nystrom_approximation,
    orthogonalize,
    psnr,
    transform_eigenvalues,
)
from tools.exp_carrier_domain import load_L  # noqa: E402

REF_DATA = "/root/reference/data"


def train(channel, nr, nc, hx, hy, iters, k, variant="f64"):
    perm, Ka, Kab = compute_kernel(channel, nr, nc, hx, hy)
    if variant == "phi32":
        Ka = Ka.astype(np.float32).astype(np.float64)
        Kab = Kab.astype(np.float32).astype(np.float64)
    lam, phi = nystrom_approximation(Ka, Kab)
    if variant == "phi32":
        phi = phi.astype(np.float32).astype(np.float64)

    n = phi.shape[0]
    p = Ka.shape[0]
    if variant == "sinkhorn32":
        phi_l = phi.astype(np.float32)
        lam_l = lam.astype(np.float32)
        r = np.ones(n, np.float32)
        c = None
        for _ in range(iters):
            c, _ = inplace_reciprocal(phi_l @ (lam_l * (phi_l.T @ r)))
            c = c.astype(np.float32)
            r, _ = inplace_reciprocal(phi_l @ (lam_l * (phi_l.T @ c)))
            r = r.astype(np.float32)
        r = r.astype(np.float64)
        c = c.astype(np.float64)
    elif variant == "int16":
        colmax = np.max(np.abs(phi), axis=0)
        scale = np.where(colmax > 0, colmax / 32767.0, 1.0)
        phi_q = np.round(phi / scale).clip(-32767, 32767) * scale
        r = np.ones(n)
        c = None
        for _ in range(iters):
            c, _ = inplace_reciprocal(phi_q @ (lam * (phi_q.T @ r)))
            r, _ = inplace_reciprocal(phi_q @ (lam * (phi_q.T @ c)))
    else:
        r = np.ones(n)
        c = None
        for _ in range(iters):
            c, _ = inplace_reciprocal(phi @ (lam * (phi.T @ r)))
            r, _ = inplace_reciprocal(phi @ (lam * (phi.T @ c)))
    Ga = phi[:p] * lam[None, :]
    Wa = (r[:p, None] * Ga) @ (c[:p, None] * phi[:p]).T
    Wab = (r[:p, None] * Ga) @ (c[p:, None] * phi[p:]).T

    if variant == "chain32":
        V, S = orthogonalize(Wa.astype(np.float32).astype(np.float64),
                             Wab.astype(np.float32).astype(np.float64), k)
        # chain arithmetic at f32 resolution: round every chain product
        V = V.astype(np.float32).astype(np.float64)
        S = S.astype(np.float32).astype(np.float64)
    else:
        V, S = orthogonalize(Wa, Wab, k)
    Vfull = np.empty_like(V)
    Vfull[perm] = V
    return Vfull, S


def enhance(channel, V, S, weights, f32=False):
    fS = transform_eigenvalues(S, weights)
    if f32:
        V = V.astype(np.float32)
        fS = fS.astype(np.float32)
        c = channel.reshape(-1).astype(np.float32)
        out = V @ (fS.astype(np.float32) * (V.T @ c))
    else:
        out = V @ (fS * (V.T @ channel.reshape(-1)))
    return np.clip(np.asarray(out, np.float64), 0, 255)


CASES = [
    ("flower", "flower-50.bmp", (10, 20, 100, 30, 50, 30), [2, 3, 4, 1]),
    ("paper", "paper.jpg", (20, 20, 1000, 40, 50, 20), [0.5, 1, 5, 1]),
    ("brickwall-links", "brickwall-20.bmp",
     (10, 20, 3000, 25, 10, 20), [2, 3, 3, 1.04]),
]


def main():
    for name, fname, (nr, nc, hx, hy, iters, k), weights in CASES:
        L = load_L(os.path.join(REF_DATA, fname))
        V0, S0 = train(L, nr, nc, hx, hy, iters, k, "f64")
        base = enhance(L, V0, S0, weights)
        row = {"case": name}
        for variant in ("phi32", "sinkhorn32", "int16", "chain32"):
            V, S = train(L, nr, nc, hx, hy, iters, k, variant)
            e = enhance(L, V, S, weights)
            row[variant] = round(float(psnr(base, e)), 1)
        e = enhance(L, V0, S0, weights, f32=True)
        row["apply32"] = round(float(psnr(base, e)), 1)
        # Ka spectrum shape: how close the eps cutoff sits (margin driver
        # candidate — truncation chaos).
        _, Ka, _ = compute_kernel(L, nr, nc, hx, hy)[0:3]
        U, lam = eigen_decomposition(Ka)
        row["m_over_p"] = round(lam.size / Ka.shape[0], 3)
        row["lam_min"] = float(f"{lam.min():.2e}") if lam.size else None
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
