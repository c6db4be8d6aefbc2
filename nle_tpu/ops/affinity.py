"""Photometric-spatial Gaussian affinity construction.

Affinity between pixels i, j of a single channel y:
  K(i, j) = exp(-(dr^2 + dc^2)/hx^2 - (y_i - y_j)^2/hy^2)
(semantics of the reference `negativeWeightedDistance` + bulk exp,
src/filter.cpp:104-145).

Precision note (load-bearing for golden parity, see tests/test_golden.py):
coordinates and 8-bit intensities are small integers, so their differences
and squared differences are *exact* in float32; scaling by 1/hx^2, 1/hy^2
happens only after squaring, leaving ~2-3 ulp total argument error. Scaling
the features *before* differencing (y/hy etc.) costs ~100x more precision
and measurably degrades PSNR through the Nystrom chain's amplification.

Two paths:
  - `affinity_block`: dense (p, q) block via XLA broadcast + exp. Used for
    Ka (p x p — tiny) and as the fallback/reference path for K_AB.
  - `affinity_matmul`: the fused hot op — computes `K_AB^T @ B` tile by tile
    without ever materializing the (p, N) K_AB in HBM. This is what lifts
    the reference's O(100)x O(100) size limit (reference README.md:7,96):
    each (tile, p) affinity block lives only in VMEM, feeding the MXU
    directly. Pallas kernel in nle_tpu/ops/pallas/affinity_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nle_tpu.ops.precision import stage2_matmul


def features(rows: jax.Array, cols: jax.Array, y: jax.Array, dtype=None) -> jax.Array:
    """Stack raw pixel features (row, col, intensity) as (N, 3).

    Unscaled on purpose — see the precision note above. The bandwidth
    weights (sw = 1/hx^2, pw = 1/hy^2) are applied inside the kernels.
    """
    dtype = y.dtype if dtype is None else dtype
    return jnp.stack(
        [rows.astype(dtype), cols.astype(dtype), y.astype(dtype)], axis=-1
    )


def bandwidth_weights(hx, hy, dtype=jnp.float32):
    """(sw, pw) = (1/hx^2, 1/hy^2), computed in float64 like the reference
    (src/filter.cpp:128-129) then cast."""
    sw = 1.0 / (float(hx) * float(hx))
    pw = 1.0 / (float(hy) * float(hy))
    return jnp.asarray(sw, dtype), jnp.asarray(pw, dtype)


def affinity_block(fa: jax.Array, fb: jax.Array, sw, pw) -> jax.Array:
    """Dense (p, q) affinity block from raw feature rows fa (p, 3), fb (q, 3)."""
    dr = fa[:, None, 0] - fb[None, :, 0]
    dc = fa[:, None, 1] - fb[None, :, 1]
    dy = fa[:, None, 2] - fb[None, :, 2]
    return jnp.exp(-(sw * (dr * dr + dc * dc) + pw * (dy * dy)))


def affinity_matmul_xla(fa: jax.Array, fb: jax.Array, B: jax.Array, sw, pw,
                        tile: int = 16384) -> jax.Array:
    """K(fb, fa) @ B == (q, p) @ (p, m), computed in row tiles of fb.

    XLA fallback for the Pallas kernel: materializes only (tile, p) affinity
    blocks. fb is padded to a tile multiple; pad rows produce garbage rows
    that are sliced off.
    """
    q = fb.shape[0]
    m = B.shape[1]
    n_tiles = max(1, -(-q // tile))
    qpad = n_tiles * tile
    fbp = jnp.pad(fb, ((0, qpad - q), (0, 0)))

    def body(fb_tile):
        k = affinity_block(fb_tile, fa, sw, pw)  # (tile, p)
        # NLE_STAGE2_DOTS-gated like the Pallas twin (f64 oracle runs
        # keep the exact dot — the split is f32-only).
        return stage2_matmul(k, B, "phi")

    out = jax.lax.map(body, fbp.reshape(n_tiles, tile, 3))
    return out.reshape(qpad, m)[:q]


def affinity_matmul(fa: jax.Array, fb: jax.Array, B: jax.Array, sw, pw, *,
                    use_pallas: bool | None = None,
                    out_rows: int | None = None) -> jax.Array:
    """Fused exp-affinity x matrix product: rows = fb pixels, cols = B cols.

    Dispatches to the Pallas TPU kernel when running on TPU (or when forced),
    else the tiled XLA path.

    FOOTGUN (pinned-platform environments): the use_pallas=None default
    keys off the PROCESS default backend, not the devices the computation
    actually runs on. Code that computes on CPU devices while the process
    default is TPU — a virtual CPU mesh under the pinned axon platform,
    jax.device_put'd CPU arrays — must pass use_pallas=False explicitly, or
    the Pallas TPU lowering fails on the CPU backend (parallel/sharded.py
    decides by the MESH devices' platform for exactly this reason).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and fa.dtype == jnp.float32:
        from nle_tpu.ops.pallas.affinity_kernel import (
            affinity_matmul_pallas,
            ptiled_fits,
        )

        # The VMEM bound is the width of B, not p (the p-tiled kernel
        # streams sample slices): any grid size works while B is narrow
        # enough.
        if ptiled_fits(B.shape[1]):
            return affinity_matmul_pallas(fa, fb, B, sw, pw,
                                          out_rows=out_rows)
    out = affinity_matmul_xla(fa, fb, B, sw, pw)
    if out_rows is not None:
        # Direct-write padded contract (zero tail rows/cols) on the XLA
        # fallback: an explicit pad — only CPU/interpret paths land here.
        mpad = -(-B.shape[1] // 128) * 128
        out = jnp.pad(out, ((0, out_rows - out.shape[0]),
                            (0, mpad - out.shape[1])))
    return out
