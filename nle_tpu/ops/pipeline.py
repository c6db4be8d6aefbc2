"""The five-stage filter-training pipeline as jitted pure functions.

Composition (reference NLEFilter::trainFilter, src/filter.cpp:480-512):
  sample -> affinity (Ka, fused K_AB) -> Nystrom -> Sinkhorn -> orthogonalize
  -> permute packed order back to pixel order.

Everything on-device operates in packed [selected; rest] order with static
shapes; the (host, static) `SampleGrid` supplies the coordinates and the
permutation.

Two-stage structure: the number of Nystrom eigenvalues kept by the eps
truncation, m = #{lam_i(Ka) >= eps}, is data-dependent, and the reference
*re-partitions on m*: its `sinkhorn` reads `p = phi.cols()` and reconstructs
the balanced blocks as Wa (m, m) = the first m *rows* of phi — i.e. when
truncation occurs (m < p) the "sampled block" boundary shifts from the p
sampled pixels to the first m of them (src/filter.cpp:247-250). Shapes
downstream therefore depend on m, so stage 1 (eigh of Ka) is resolved before
stage 2 is compiled.

m-bucketing: compiling stage 2 per exact m would mean a fresh XLA program
for every distinct kept rank (minutes each through the remote-compile
service). Instead the static column count is the bucket mb = bucket_m(m, p)
(m rounded up to NLE_M_BUCKET=128, capped at p) and the true m rides to the
device as a traced scalar inside the stage-1 upload. Columns m..mb of
Um/lam/Uinv are zero-padded — exact zeros propagate through the whole
factored algebra (zero eigenvalues contribute nothing to any contraction) —
and the balanced-block *row* boundary at m is handled with masks instead of
slices: c is zeroed on rows < m by comparison with the traced m, and the
final V overlays the host-computed Va (zero-padded to mb rows) additively
onto the device tail product (whose rows < m are zero because c is). Every
sum gains only exact +0.0 terms, so the algebra is unchanged; the only
numeric difference vs a per-m compile is XLA's shape-dependent reduction
strategy (measured <= f32 noise, tests/test_bucketing.py), while the number
of distinct stage-2 programs drops from O(p) to O(p/128).

Precision policy (empirically established against the reference golden
images — see tests/test_golden.py):
- The *only* chaos-sensitive computation is stage 1's eigenbasis: Ka's
  spectrum runs down to the 1e-10 cutoff, so Lambda^{-1} amplifies basis
  rotations of the near-degenerate tail; a float32-rounded Ka (or a float32
  eigensolver) picks an O(1)-different basis and costs ~25 dB. Stage 1
  therefore defaults to float64 LAPACK on the host ("host64") — it is a
  p x p problem (p ~ hundreds), milliseconds of host time.
- Everything streamed at N scale (K_AB, phi, Sinkhorn, V) is float32 on
  device: algebraic invariance (every Lambda^{-1} is re-multiplied by
  Lambda downstream) cancels the amplified noise to ~1e-7 relative.
- TPU matmuls default to bfloat16 MXU passes; that *is* enough to re-excite
  the chaos, so all device matmuls here run under
  jax.default_matmul_precision("highest") (full f32).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from nle_tpu.config import default_eps
from nle_tpu.ops.affinity import (
    affinity_block,
    affinity_matmul,
    bandwidth_weights,
    features,
)
from nle_tpu.ops.linalg import eigh_descending, safe_reciprocal
from nle_tpu.ops.linalg import eigh64 as _eigh64
from nle_tpu.ops.orthogonalize import host_chain64, orthogonalize_factored
from nle_tpu.ops.precision import stage2_gram, stage2_matmul
from nle_tpu.ops.sampling import SampleGrid, sample_grid
from nle_tpu.ops.sinkhorn import sinkhorn_vectors
from nle_tpu.utils.logging import (
    logger,
    stage,
    warn_rank_deficient,
    warn_truncation,
)
from nle_tpu.utils.transfer import fetch as transfer_fetch, transfer_pool


_GRID_CACHE: dict = {}

# Above this phi size the pipeline stops materializing the scaled
# diag(c) phi product and fuses the scaling into the Pallas Sb/Vb kernels
# instead — phi stays the only N-scale buffer (doubling the largest image
# a chip can hold) AND, since the 3-pass split moved inside the scaled
# kernels (r3), the fused path is also FASTER: same-session stream A/B at
# 1 MP measured 2.82 MP/s fused vs 2.61 materialized (r4, 2026-08-20;
# isolated parts: gram 12 vs cphi+gram 27 ms). The old 3 GiB default
# predates the in-kernel split — 64 MiB keeps only genuinely tiny images
# (< ~0.1 MP at m=128) on the materialized branch, where Pallas fixed
# overheads outweigh the copy.
_CPHI_BYTES_LIMIT = int(os.environ.get("NLE_CPHI_BYTES", str(64 << 20)))

# Above this phi size even the un-scaled phi no longer fits comfortably in
# HBM (16 GB on v5e): switch to the phi-FREE streaming stage 2, which
# recomputes affinity tiles from the 12 B/pixel features inside every
# Sinkhorn pass (ops/pallas/streaming_kernel.py). Memory becomes O(N),
# lifting the single-chip ceiling from ~5 MP to ~50 MP; each pass costs
# ~7 ms/MP (VPU exp-bound) vs ~5.6 ms for the HBM-bound dense half-step.
_STREAM_BYTES_LIMIT = int(os.environ.get("NLE_STREAM_BYTES", str(8 << 30)))


def _grid_device_arrays(grid: SampleGrid, dtype):
    """Device-resident (perm, rows, cols) for a SampleGrid, cached — these
    are static per (image shape, sample counts) and re-uploading ~12 MB/MP
    per call would dominate tunnel-attached-TPU latency."""
    # The selected-pixel set fully determines the grid (p entries — hashing
    # it is microseconds).
    key = (grid.nrows, grid.ncols, grid.sel_rows.tobytes(),
           grid.sel_cols.tobytes(), jnp.dtype(dtype).name)
    hit = _GRID_CACHE.get(key)
    if hit is None:
        perm = jnp.asarray(grid.perm)
        # Coordinates stay exact-integer floats: sub-32-bit payload dtypes
        # (bf16/f16) would quantize row/col indices past 256/2048 columns,
        # breaking the raw-integer-difference affinity rule
        # (ops/affinity.py) with banded wrong distances.
        coord_dt = (dtype if jnp.dtype(dtype).itemsize >= 4
                    else jnp.float32)
        rr = (perm // grid.ncols).astype(coord_dt)
        cc = (perm % grid.ncols).astype(coord_dt)
        hit = (perm, rr, cc)
        while len(_GRID_CACHE) > 16:
            # Evict the OLDEST entry, not the whole cache: dict preserves
            # insertion order, and clearing everything would re-upload
            # every hot grid's ~12 MB/MP on its next call.
            _GRID_CACHE.pop(next(iter(_GRID_CACHE)))
        _GRID_CACHE[key] = hit
    return hit


@functools.partial(jax.jit, static_argnames=("p", "eps", "eigh_method"))
def ka_eigh_stage(
    y: jax.Array, rows: jax.Array, cols: jax.Array, hx: jax.Array, hy: jax.Array,
    *, p: int, eps: float, eigh_method: str = "xla",
):
    """Stage 1 (on-device variant): Ka affinity block; masked descending eigh.

    hx, hy here are the bandwidth *weights* (sw, pw) = (1/hx^2, 1/hy^2).
    """
    with jax.default_matmul_precision("highest"):
        f = features(rows[:p], cols[:p], y[:p])
        Ka = affinity_block(f, f, hx, hy)
        U, lam = eigh_descending(Ka, eps, eigh_method)
    return U, lam


def _build_ka64(y_sel, rows_sel, cols_sel, hx, hy) -> np.ndarray:
    """Exact float64 Ka on the host, op-for-op with the reference
    (src/filter.cpp:114-145): squared integer distances, sw = 1/hx^2,
    pw = 1/hy^2, bulk exp."""
    r = np.asarray(rows_sel, np.float64)
    c = np.asarray(cols_sel, np.float64)
    y = np.asarray(y_sel, np.float64)
    sw = 1.0 / (float(hx) * float(hx))
    pw = 1.0 / (float(hy) * float(hy))
    d2s = (r[:, None] - r[None, :]) ** 2 + (c[:, None] - c[None, :]) ** 2
    d2i = (y[:, None] - y[None, :]) ** 2
    return np.exp(-sw * d2s - pw * d2i)


def ka_eigh_host64(y_sel, rows_sel, cols_sel, hx, hy, eps):
    """Stage 1 (default): exact float64 Ka + LAPACK eigh on the host.

    Mirrors the reference computation op-for-op (src/filter.cpp:114-145,
    204-228): descending eigenvalues truncated at eps. Returns float64
    (U (p, m), lam (m,), U * Lambda^{-1} (p, m)) — the caller casts to the
    device dtype, keeping the f64-chosen eigenbasis.
    """
    Ka = _build_ka64(y_sel, rows_sel, cols_sel, hx, hy)
    lam, U = _eigh64(Ka)
    lam = lam[::-1]
    U = U[:, ::-1]
    m = int(np.count_nonzero(lam >= eps)) if lam.size else 0
    # lam is descending, so the first m entries are exactly the kept ones.
    U_m = U[:, :m]
    lam_m = lam[:m]
    return U_m, lam_m, U_m / lam_m[None, :]


def ka_eigh_topk_host64(y_sel, rows_sel, cols_sel, hx, hy, eps, k0: int = 64):
    """Stage 1 via the iterative top-k solver — the reference's USE_SPECTRA
    build path (topkEigenDecomposition, src/filter.cpp:169-200), applied to
    eig(Ka) with k doubling until the eps tail is captured.

    Pays off only when the Ka spectrum truncates hard (m << p). Measured on
    this host for a DENSE grid (p = 2400 on rock2, m = 1446): ARPACK 165 s
    vs full LAPACK 5.3 s — Gaussian-kernel spectra at eps = 1e-10 keep most
    of their eigenvalues, so the full solver stays the right default and
    this knob exists for reference parity + genuinely-truncating regimes
    (e.g. tight hy on smooth scenes). Falls back to the full solver when
    doubling reaches p - 1 without capturing the tail.
    """
    from nle_tpu.ops.linalg import topk_eigendecomposition

    Ka = _build_ka64(y_sel, rows_sel, cols_sel, hx, hy)
    p = Ka.shape[0]
    if p <= 2:
        return ka_eigh_host64(y_sel, rows_sel, cols_sel, hx, hy, eps)
    k = min(max(k0, 8), p - 1)
    while True:
        U, lam, converged = topk_eigendecomposition(
            Ka, k, eps, return_converged=True)
        if not converged:
            # A short NON-converged result is indistinguishable from
            # genuine eps-truncation by length alone; treating it as "tail
            # captured" would silently train an under-ranked filter (the
            # balanced-block boundary moves and golden PSNR collapses).
            # The warn already fired; the exact solver recovers.
            return ka_eigh_host64(y_sel, rows_sel, cols_sel, hx, hy, eps)
        if lam.size < k:
            break                    # truncation happened: tail captured
        if k >= p - 1:
            # Spectrum may extend beyond the n-1 pairs ARPACK can deliver;
            # the full solver is both exact and faster by this point.
            return ka_eigh_host64(y_sel, rows_sel, cols_sel, hx, hy, eps)
        k = min(2 * k, p - 1)
    if lam.size == 0:
        return U[:, :0], lam, U[:, :0]
    return U, lam, U / lam[None, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "m", "n_sinkhorn_iter", "n_eig_vectors", "eps", "use_pallas",
        "eigh_method",
    ),
)
def train_filter_stage2(
    y: jax.Array,       # (N,) channel values, packed [selected; rest]
    rows: jax.Array,    # (N,) row coords, packed
    cols: jax.Array,    # (N,) col coords, packed
    Um: jax.Array,      # (p, m) kept eigenvectors of Ka (descending)
    lam_m: jax.Array,   # (m,) kept eigenvalues of Ka
    Uinv: jax.Array,    # (p, m) U * Lambda^{-1} (host-f64-computed, cast)
    sw: jax.Array,      # 1/hx^2 (host-f64-computed, cast)
    pw: jax.Array,      # 1/hy^2
    *,
    p: int,
    m: int,             # kept eigenvalue count — static, from stage 1
    n_sinkhorn_iter: int,
    n_eig_vectors: int,
    eps: float,
    use_pallas: bool | None = None,
    eigh_method: str = "xla",
):
    """Stage 2: Nystrom extension + Sinkhorn + orthogonalize.

    Returns (V_packed (N, k), S (k,)) with k = min(n_eig_vectors, m).
    """
    with jax.default_matmul_precision("highest"):
        f = features(rows, cols, y)                   # (N, 3)
        fa, fb = f[:p], f[p:]

        # --- Nystrom: extend eigenvectors to all pixels (src/filter.cpp:257-280)
        phi_b = affinity_matmul(fa, fb, Uinv, sw, pw, use_pallas=use_pallas)  # (N-p, m)
        phi = jnp.concatenate([Um, phi_b], axis=0)        # (N, m); phi[:p] == Um

        # --- Sinkhorn balancing (src/filter.cpp:230-254) ---
        r, c = sinkhorn_vectors(phi, lam_m, n_sinkhorn_iter, eps)

        # --- Balanced-block reconstruction at the *m* boundary ---
        # Reference `sinkhorn` uses p := phi.cols() == m: Wa is (m, m) over
        # the first m packed rows; everything below row m is the "ab" part.
        phi_top = phi[:m]                                 # == Um[:m]
        Ga = phi_top * lam_m[None, :]                     # (m, m)
        RGa = r[:m, None] * Ga
        Wa = RGa @ (c[:m, None] * phi_top).T
        phi_rest = phi[m:]                                # (N - m, m)

        # --- One-shot orthogonalization, Wab fully factored ---
        k = min(n_eig_vectors, m)
        V, S = orthogonalize_factored(
            Wa, RGa, phi_rest, c[m:], r[:m], Ga, k, eps, eigh_method
        )
    return V, S


def bucket_m(m: int, p: int) -> int:
    """Static stage-2 column count for a data-dependent kept rank m.

    Rounds m up to the NLE_M_BUCKET width (default 128, the MXU/VREG lane
    count the Pallas layouts pad to anyway), capped at p — so a given
    sampling grid compiles at most ceil(p/128) distinct stage-2 programs
    instead of one per observed m. NLE_M_BUCKET<=1 disables bucketing
    (mb == m; one program per exact rank, the pre-bucketing behavior)."""
    b = int(os.environ.get("NLE_M_BUCKET", "128"))
    if b <= 1:
        return m
    return min(-(-m // b) * b, p)


def stage2_dense_small(n: int, mb: int) -> bool:
    """Whether the fused dense path materializes the scaled diag(c) phi
    product (small images) or fuses the scaling into the Pallas Sb/Vb
    kernels (large images). stage 2a branches on this internally (it is
    static under jit); host callers use it to know whether the factor that
    comes back is pre-scaled — keep both in one place.

    Very wide rank buckets (mpad past ~1400, i.e. dense sampling grids)
    also take the cphi branch: the fused kernels' (Mpad, Mpad) VMEM
    accumulator does not fit there (scaled_fits_vmem) and an unguarded
    dispatch dies in Mosaic's compile-time VMEM check. (train_filter
    additionally prefers the streaming stage 2 in that regime so the cphi
    buffer is never actually paid at capacity sizes; this fallback covers
    callers that force the dense path, e.g. the pipelined batch trainer.)"""
    from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_fits_vmem
    from nle_tpu.ops.pallas.sinkhorn_kernel import padded_shape

    npad, mpad = padded_shape(n, mb)
    return 4 * npad * mpad <= _CPHI_BYTES_LIMIT or not scaled_fits_vmem(mpad)


def _stage2_fused(dtype, use_pallas: bool | None) -> bool:
    """Whether stage 2a takes the fused Pallas path for this dtype — the
    ONE definition both the stage-2a dispatch and stage2b_factor_scaled
    derive from, so the two gates cannot drift apart (a drift would scale
    the factor twice or never and silently corrupt V)."""
    pallas_ok = (jax.default_backend() == "tpu" if use_pallas is None
                 else use_pallas)
    return pallas_ok and jnp.dtype(dtype) == jnp.float32


def stage2b_factor_scaled(n: int, mb: int, dtype=jnp.float32,
                          use_pallas: bool | None = None) -> bool:
    """Whether stage 2a returns a pre-scaled diag(c) phi factor (vs the
    unscaled padded phi whose scaling stage 2b fuses into the Pallas
    matmul) — the static `scaled` argument train_filter_stage2b needs. ONE
    definition shared by every caller of the split stage-2 protocol
    (train_filter, models/batch.py) so the branch cannot drift."""
    return (not _stage2_fused(dtype, use_pallas)
            or stage2_dense_small(n, mb))


def host_orthogonalize(rc_np, sb, Um64, lam64, m: int, mb: int, k: int,
                       eps: float, q_solver: str | None = None):
    """The host-f64 side between stage 2a and 2b: rebuild the balanced-
    block small matrices from stage 1's f64 eigensystem, run the
    orthogonalization chain, and pack [Va | GrT] zero-padded to the rank
    bucket for the single (mb, 2k) upload. Returns (va_np f64, Sq).
    Shared by train_filter and the pipelined batch trainer.

    rc_np: (>=2, mb) host f64 block; rows 0/1 are [r; c] (any extra
    rows — the carrier guard statistic — are ignored here). sb: the (>=m, >=m) Sb gram as a
    host array, a device array, or a ZERO-ARG CALLABLE producing either —
    the callable is resolved only after eig(Wa)+E (~160 ms of host work),
    so callers can hand in a concurrent fetch and hide the transfer.

    q_solver picks the eig(Q) solver inside host_chain64 ("auto" default:
    ARPACK top-k where it measures faster); NLE_Q_SOLVER overrides."""
    if q_solver is None:
        q_solver = os.environ.get("NLE_Q_SOLVER", "auto")
    rt, ct = rc_np[0][:m], rc_np[1][:m]
    phi_top = Um64[:m]
    Ga = phi_top * lam64[None, :]
    RGa = rt[:, None] * Ga
    Wa = RGa @ (ct[:, None] * phi_top).T

    def sb_resolved():
        raw = sb() if callable(sb) else sb
        return np.asarray(raw, np.float64)[:m, :m]

    Va, GrT, Sq = host_chain64(Wa, RGa, sb_resolved, k, eps,
                               q_solver=q_solver)
    warn_rank_deficient("orthogonalize eig(Q)", int(np.count_nonzero(Sq)), k)
    va_np = np.zeros((mb, 2 * k))
    va_np[:m, :k] = Va
    va_np[:m, k:] = GrT
    return va_np, Sq


def pack_stage2b_upload(split: bool, va_np, rc_np, Um64, m: int, p: int,
                        k: int):
    """The host->device stage-2b upload for either factor layout.

    Assembled layouts (split=False): va_np itself — the (mb, 2k)
    [Va | GrT] block host_orthogonalize packed.

    SPLIT layout: the (p + mb, k) [top; GrT] block, where top is the
    ENTIRE top-block V computed in f64 on the host — Va rows < m plus the
    (c[m:p] * Um[m:p]) @ GrT tail (exactly the sharded protocol,
    parallel/sharded.py element_host_chain; ~20 MFLOP at p=600, host
    microseconds) — so the device's stage 2b is one fused scaled matmul
    over the rest block plus a row concat. Needs the FULL (3, p) rc the
    split stage 2a returns (the assembled path fetches only (3, mb))."""
    if not split:
        return va_np
    GrT = va_np[:m, k:]
    cp64 = np.asarray(rc_np[1], np.float64)
    top = np.concatenate(
        [va_np[:m, :k], (cp64[m:p, None] * Um64[m:]) @ GrT], axis=0)
    return np.concatenate([top, va_np[:, k:]], axis=0)


def check_carrier_guard(rc_np) -> bool:
    """Host side of the int16-carrier validity guard (VERDICT r4 #2):
    reads the crush statistic off the fetched rc block (row 2, col 0 —
    sentinel -1.0 when no carrier engaged) and decides whether the caller
    must re-dispatch stage 2a through the f32 carrier. Warn-and-continue
    semantics throughout (the reference's solver-failure policy,
    src/filter.cpp:180-183): over-threshold with the default auto resolve
    -> warn + True (caller retrains f32); over-threshold with the carrier
    EXPLICITLY forced on -> warn + False (operator override wins); guard
    off (NLE_INT16_GUARD=off) -> always False."""
    if rc_np.shape[0] <= 2:
        return False
    crush = float(rc_np[2, 0])
    if crush < 0.0:
        return False          # no carrier engaged
    from nle_tpu.ops.pallas.sinkhorn_kernel import carrier_guard_decision

    return carrier_guard_decision(crush, logger, "crush fraction",
                                  "retraining")


def _sb_tri_blocks(sb_dev):
    """Lower-triangle 128-BLOCK pack of Sb: pad to (mbp, mbp) and stack
    the nb(nb+1)/2 lower-triangle (128, 128) blocks (nb = mbp/128) into
    one (ntri*128, 128) buffer — static slices + one concat, NO gather
    (the elementwise tril gather the r2 attempt used cost ~62 ms of
    device time at mb=640; these are ~15 aligned block copies, ~1 MB
    total). Traced INSIDE stage 2a (sb_tri=True) so the pack rides the
    same device program: a separate pack dispatch queues behind the next
    frame's whole stage 2a in the pipelined stream and measured 25%
    SLOWER end-to-end."""
    mb = sb_dev.shape[0]
    mbp = -(-mb // 128) * 128
    sb_p = (jnp.pad(sb_dev, ((0, mbp - mb), (0, mbp - mb)))
            if mbp != mb else sb_dev)
    nb = mbp // 128
    blocks = [sb_p[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128]
              for i in range(nb) for j in range(i + 1)]
    return jnp.concatenate(blocks, axis=0)


@functools.partial(jax.jit, static_argnames=("mbp",))
def _pack_sb_tri_blocks(sb_dev, *, mbp: int):
    """Standalone jitted form of _sb_tri_blocks (tests; mbp must match
    the rounded-up block extent)."""
    assert mbp == -(-sb_dev.shape[0] // 128) * 128
    return _sb_tri_blocks(sb_dev)


def _unpack_sb_tri(packed_np: np.ndarray, mb: int) -> np.ndarray:
    """Host reassembly of _pack_sb_tri_blocks: lower blocks placed, upper
    entries mirrored from the lower triangle. Diagonal blocks keep their
    own exact upper halves; off-diagonal upper entries become the lower
    triangle's transpose — they differ from the true Sb by its measured
    ulp-class asymmetry (~3e-9 relative; the Sb gram's accumulation is
    not bitwise symmetric). Harmless for the mainline, which reads the
    lower triangle only — the full validation record is in
    resolve_sb_tri."""
    mbp = -(-mb // 128) * 128
    nb = mbp // 128
    out = np.empty((mbp, mbp), np.float64)
    idx = 0
    for i in range(nb):
        for j in range(i + 1):
            blk = packed_np[idx * 128:(idx + 1) * 128]
            out[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] = blk
            if j < i:
                out[j * 128:(j + 1) * 128, i * 128:(i + 1) * 128] = blk.T
            idx += 1
    return out[:mb, :mb]


def resolve_sb_tri() -> bool:
    """Whether the Sb fetch ships only the lower-triangle 128-blocks
    (-32-40% of the stream's largest down-link payload; the r5 timeline
    pinned the stream residual to down-link bytes). DEFAULT ON — it is
    EXACT for the mainline: the host chain consumes Sb through the
    lower-triangle-only Cholesky congruence (ops/orthogonalize.py
    _scaled_congruence) and the lower triangle ships bit-identically, so
    the full chip golden sweep with the pack on reproduced every config's
    PSNR to the last digit (GOLDEN_TPU r5) and the CPU end-to-end test
    pins bitwise equality. Only the rare non-PSD Cholesky-failure
    fallback (warn-and-continue territory) sees the mirrored upper
    triangle (~3e-9 relative change — Sb's own measured asymmetry).
    Same-session interleaved stream A/B on a quiet tunnel: on 3.012/
    2.557/2.673/3.040 vs off 2.855/2.629/2.588/2.944 MP/s (+2.5% mean;
    bytes-proportional, so loaded hours save more). The pack MUST ride
    the stage-2a program (static sb_tri arg): a separate pack dispatch
    queues behind the next frame's stage 2a and measured 25% SLOWER.
    NLE_SB_TRI=off restores the full fetch; resolved per CALL (the jit
    key carries the result)."""
    raw = os.environ.get("NLE_SB_TRI", "on").lower()
    if raw in ("off", "0", "false"):
        return False
    if raw in ("on", "1", "true"):
        return True
    raise ValueError(f"NLE_SB_TRI={raw!r}: expected on/off")


def submit_sb_fetch(sb_dev):
    """Submit the Sb device->host fetch on the transfer pool. Returns a
    zero-arg callable producing the (mb, mb) f64 array — exactly the lazy
    `sb` shape host_orthogonalize accepts, so the fetch overlaps
    eig(Wa)+E on the host.

    An elementwise lower-triangle pack (mb(mb+1)/2 floats) was measured
    and REVERTED in r2: the packing gather costs ~62 ms of DEVICE time at
    mb=640 (TPU gathers are scalar-slow; 205k elements) against a ~0.8 MB
    fetch saving that was already hidden under the host chain. The r5
    default (NLE_SB_TRI=on) packs lower-triangle 128-BLOCKS instead —
    static slices inside the stage-2a program, no gather — for -32-40%
    of the payload, exact for the chain's lower-triangle consumption
    (see resolve_sb_tri); this function auto-detects the packed layout
    by shape and reassembles."""
    if sb_dev.ndim == 2 and sb_dev.shape[1] == 128 \
            and sb_dev.shape[0] % 128 == 0 \
            and sb_dev.shape[0] != sb_dev.shape[1]:
        # Tri-packed Sb (sb_tri=True threaded into stage 2a — the pack
        # rides the SAME device program; a separate pack dispatch was
        # measured 25% SLOWER in the stream because it queues behind the
        # next frame's whole stage 2a). Recover mb from the block count.
        ntri = sb_dev.shape[0] // 128
        nb = int((np.sqrt(8 * ntri + 1) - 1) / 2)
        assert nb * (nb + 1) // 2 == ntri, sb_dev.shape
        fut = transfer_pool().submit(transfer_fetch, sb_dev)

        def resolve_tri():
            return _unpack_sb_tri(
                np.asarray(fut.result(), np.float64), nb * 128)

        return resolve_tri
    fut = transfer_pool().submit(transfer_fetch, sb_dev)

    def resolve():
        return np.asarray(fut.result(), np.float64)

    return resolve


def pack_channel(channel_np: np.ndarray, perm: np.ndarray):
    """Pack a channel into [selected; rest] order; returns (packed array,
    is_8bit) where is_8bit means the values are integers in [0, 255] and the
    packed array is uint8 (4x less host->device transfer)."""
    packed = channel_np.reshape(-1)[perm]
    if packed.dtype == np.uint8:
        return packed, True
    if (packed.min() >= 0 and packed.max() <= 255
            and np.array_equal(packed, np.rint(packed))):
        return packed.astype(np.uint8), True
    return packed, False


def pack_stage1(Um64, lam64, dtype=np.float32, mb: int | None = None):
    """One (p+2, mb) host array holding [Um; lam; m] — stage 1's device
    inputs ride ONE host->device transfer instead of three (each transfer
    over the tunnel-attached TPU costs ~30-60 ms of latency).

    Uinv = Um / lam is NOT shipped: it is mathematically redundant
    (ka_eigh_host64 derives it by elementwise division) and the device
    recomputes it in one cheap elementwise op inside _unpack_stage1 —
    halving the pipeline's largest per-image upload (p x mb payload floats
    at p = 600 is ~1.5 MB). The device-side division of the rounded
    (Um, lam) differs from rounding the host-f64 quotient by <= ~1.5 ulp —
    the same noise class as every other f32 op in stage 2 (golden-PSNR
    validated; the f64-critical work all happens in stage 1 / the host
    chain, CLAUDE.md precision policy).

    Columns are zero-padded from the true kept rank m to the bucket mb so
    stage 2 compiles per bucket, not per rank; the last row carries m itself
    so the boundary masks inside stage 2 are traced values, not static
    shapes. m rides as two base-256 digits (each <= 255, exact in every
    payload dtype incl. bfloat16/float16 — a single f-coded integer would
    round above the dtype's integer range and silently shift the balanced-
    block boundary)."""
    p, m = Um64.shape
    mb = m if mb is None else mb
    out = np.zeros((p + 2, mb), dtype)
    out[:p, :m] = Um64
    out[p, :m] = lam64
    out[p + 1, 0] = m % 256
    if mb > 1:
        out[p + 1, 1] = m // 256
    else:
        assert m == 1, (m, mb)  # mb >= m always
    return out


def pack_stage1_device(Um_d, lam_d, m: int, mb: int, dtype):
    """Device twin of pack_stage1: assemble [Um; lam; m-digits] from an
    already-device-resident eigensystem (stage1='device') without a
    host->device re-upload. MUST mirror pack_stage1's layout exactly —
    row p = lam, row p+1 = base-256 m digits — and a parity test pins the
    two against each other (tests/test_bucketing.py)."""
    digits = jnp.zeros((1, mb), dtype)
    digits = digits.at[0, 0].set(m % 256)
    if mb > 1:
        digits = digits.at[0, 1].set(m // 256)
    pad = ((0, 0), (0, mb - m))
    return jnp.concatenate(
        [jnp.pad(Um_d, pad), jnp.pad(lam_d[None, :], pad), digits], axis=0)


def _unpack_stage1(stage1_packed, p):
    """(Um (p, mb), lam (mb,), Uinv (p, mb), m traced int32 scalar).

    Uinv = Um / lam is recomputed here (guarded against the zero-padded
    columns beyond the true rank, whose Um columns are zero too — the
    guard value never leaks)."""
    digits = stage1_packed[p + 1].astype(jnp.float32)
    m_dyn = digits[0].astype(jnp.int32)
    if stage1_packed.shape[1] > 1:
        m_dyn = m_dyn + 256 * digits[1].astype(jnp.int32)
    Um = stage1_packed[:p]
    lam = stage1_packed[p]
    keep = lam > 0
    Uinv = jnp.where(keep[None, :], Um / jnp.where(keep, lam, 1), 0)
    return Um, lam, Uinv, m_dyn


@functools.partial(
    jax.jit,
    static_argnames=("p", "mb", "n_sinkhorn_iter", "eps", "use_pallas",
                     "interpret", "small", "split", "int16", "sb_tri"),
)
def train_filter_stage2a(
    y, rows, cols, stage1_packed, sw, pw,
    *, p: int, mb: int, n_sinkhorn_iter: int, eps: float,
    use_pallas: bool | None = None, interpret: bool = False,
    small: bool | None = None, split: bool | None = None,
    int16: bool | None = None, sb_tri: bool = False,
):
    """Device half 1 of the default (split) pipeline: Nystrom extension,
    Sinkhorn, balanced-block pieces, and the Sb reduction. Returns
    (rc (3, mb), Sb (mb, mb), factor, c_rest): rc rows 0/1 carry the
    balancing vectors — a tiny fetch (~30 ms latency floor) that unblocks the host
    chain's Wa rebuild + eig(Wa) + E — while the ~MB-sized Sb (which the
    chain needs only AFTER those, ~160 ms of host work) is fetched
    asynchronously and overlaps them (the tunnel moves ~1.4 MB in ~150 ms,
    so the split hides nearly the whole transfer).

    Shapes are static in the rank BUCKET mb = bucket_m(m, p); the true m
    arrives as a traced scalar inside stage1_packed and only drives the
    row mask on c (the balanced-block boundary, reference
    src/filter.cpp:247-250). The returned factor is the pre-scaled
    diag(c) phi when stage2_dense_small(n, mb) on the fused path (and always
    on the XLA fallback), else the unscaled padded phi whose c-scaling is
    fused into the Sb/Vb kernels so phi stays the only N-scale buffer.

    rc carries a THIRD row whose column 0 is the int16-carrier crush
    statistic (carrier_crush_frac; sentinel -1.0 when no carrier engaged)
    — it rides the existing tiny rc fetch so the host guard costs zero
    extra round trips (VERDICT r4 #2). `int16` (static, like `small`/
    `split`) forces the carrier per call: the guard's fallback re-dispatch
    passes int16=False, split=False to retrain through the bit-pinned
    assembled f32 trajectory."""
    with jax.default_matmul_precision("highest"):
        Um, lam_m, Uinv, m_dyn = _unpack_stage1(stage1_packed, p)
        f = features(rows, cols, y)
        fa, fb = f[:p], f[p:]
        n = y.shape[0]
        fused = (_stage2_fused(fa.dtype, use_pallas)
                 and Um.dtype == fa.dtype)
        small_eff = (stage2_dense_small(n, mb) if small is None
                     else bool(small))
        if fused and not small_eff:
            from nle_tpu.ops.pallas.sinkhorn_kernel import (
                resolve_split_stage2,
            )

            # Like `small`, `split` is part of the jit key: pipeline/batch
            # callers resolve the NLE_STAGE2_SPLIT/NLE_SINKHORN_INT16 env
            # at CALL time and pass it, so a mid-process knob flip (the
            # documented same-session layout A/B) retraces instead of
            # silently reusing the stale layout's cached program.
            split_eff = (resolve_split_stage2(n_sinkhorn_iter)
                         if split is None else bool(split))
            if int16 is False:
                # Guard fallback: the split layout cannot run without the
                # packed carrier.
                split_eff = False
            if split_eff:
                # SPLIT-BUFFER layout (int16 default, non-small): Um and
                # the rest block never concatenate — the affinity builder
                # direct-writes the zero-tailed padded rest block
                # (out_rows) and the Sinkhorn loop carries the top block
                # as p-sized f32 matvecs beside the packed-int16 rest
                # stream. Removes the zeros+DUS assembly (~35 ms of pure
                # copy at 1 MP, tools/profile_stage2a_parts.py r4). The
                # returned factor is the TUPLE (phib_pad,) — stage 2b
                # branches on the pytree structure; rc carries the FULL
                # (3, p) top rows + stat (the host builds the top V rows like
                # the sharded protocol, pack_stage2b_upload).
                from nle_tpu.ops.pallas.scaled_matmul_kernel import (
                    scaled_gram_pallas,
                )
                from nle_tpu.ops.pallas.sinkhorn_kernel import (
                    sinkhorn_vectors_split,
                    split_row_pad,
                )

                nb = n - p
                mpad = -(-mb // 128) * 128
                npad_b, _ = split_row_pad(nb, mb)
                phib_pad = affinity_matmul(
                    fa, fb, Uinv, sw, pw,
                    use_pallas=False if interpret else use_pallas,
                    out_rows=npad_b)
                Um_pad = (jnp.pad(Um, ((0, 0), (0, mpad - mb)))
                          if mpad != mb else Um)
                lam_pad = (jnp.pad(lam_m, (0, mpad - mb))
                           if mpad != mb else lam_m)
                rp, cp, rb, cb, crush = sinkhorn_vectors_split(
                    Um_pad, lam_pad, phib_pad, n_sinkhorn_iter,
                    float(eps), interpret=interpret)
                # (3, p): full top rows + the crush statistic riding the
                # same tiny fetch (host consumers index rows 0/1 only).
                rc = jnp.stack([rp, cp, jnp.full((p,), -1.0, rp.dtype)
                                .at[0].set(crush.astype(rp.dtype))])
                cb_rest = cb[:, None]
                cphiu = jnp.where(jnp.arange(p) >= m_dyn, cp,
                                  0.0)[:, None] * Um_pad
                Sb = ((cphiu.T @ cphiu)[:mb, :mb]
                      + scaled_gram_pallas(phib_pad, cb_rest,
                                           interpret=interpret)[:mb, :mb])
                if sb_tri:
                    Sb = _sb_tri_blocks(Sb)
                return rc, Sb, (phib_pad,), cb_rest

        # interpret=True (CPU tests of the fused branch) keeps the affinity
        # product on the XLA builder — only the fused Sinkhorn/gram kernels
        # have interpreter plumbing.
        phi_b = affinity_matmul(fa, fb, Uinv, sw, pw,
                                use_pallas=False if interpret else use_pallas)
        if fused:
            from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_gram_pallas
            from nle_tpu.ops.pallas.sinkhorn_kernel import (
                padded_shape,
                sinkhorn_vectors_fused,
            )

            # Assemble phi directly in the kernel's padded layout — saves a
            # 4*N*m-byte copy per training run.
            npad, mpad = padded_shape(n, mb)
            phi = jnp.zeros((npad, mpad), jnp.float32)
            phi = jax.lax.dynamic_update_slice(phi, Um, (0, 0))
            phi = jax.lax.dynamic_update_slice(phi, phi_b, (p, 0))
            r, c, crush = sinkhorn_vectors_fused(
                phi, lam_m, n_sinkhorn_iter, eps, n=n, interpret=interpret,
                with_stat=True, int16=int16)
            c_rest = jnp.where(jnp.arange(npad) >= m_dyn,
                               jnp.pad(c, (0, npad - n)), 0.0)[:, None]
            # `small` is part of the jit key: callers that probe both
            # branches (tests) must pass it explicitly — resolving it only
            # from the NLE_CPHI_BYTES global would let a mid-process change
            # silently reuse a trace built for the other branch.
            if small is None:
                small = stage2_dense_small(n, mb)
            if small:
                # Small enough to afford the extra N x m buffer: XLA's dense
                # matmuls on a materialized diag(c) phi are a few percent
                # faster than the fused kernels. Rows < m and columns > m are
                # exact zeros, so the full-extent gram equals the sliced one.
                # The gram is MXU-pass-bound at ambient "highest" precision;
                # stage2_gram drops to the 3-pass split under
                # NLE_STAGE2_DOTS=high (ops/precision.py).
                cphi = c_rest * phi
                Sb = stage2_gram(cphi)[:mb, :mb]
                if sb_tri:
                    Sb = _sb_tri_blocks(Sb)
                rc = jnp.stack([r[:mb], c[:mb],
                                jnp.full((mb,), -1.0, r.dtype)
                                .at[0].set(crush.astype(r.dtype))])
                return rc, Sb, cphi, c_rest
            # Large images: fuse the scaling into the Sb/Vb kernels so phi is
            # the only N-scale buffer (doubles single-chip image capacity).
            Sb = scaled_gram_pallas(phi, c_rest, interpret=interpret)[:mb, :mb]
        else:
            phi = jnp.concatenate([Um, phi_b], axis=0)
            r, c = sinkhorn_vectors(phi, lam_m, n_sinkhorn_iter, eps)
            c_rest = jnp.where(jnp.arange(n) >= m_dyn, c, 0.0)[:, None]
            cphi = c_rest * phi
            # Same NLE_STAGE2_DOTS gate as the fused branch: this XLA
            # fallback is the CPU-visible twin, so the CPU golden sweep
            # certifies the identical 3-pass arithmetic.
            Sb = stage2_gram(cphi)[:mb, :mb]
            if sb_tri:
                Sb = _sb_tri_blocks(Sb)
            rc = jnp.stack([r[:mb], c[:mb],
                            jnp.full((mb,), -1.0, r.dtype)])
            return rc, Sb, cphi, c_rest
        # Only (r_a, c_a, Sb) go to the host — Wa/RGa/Ga are recomputed
        # there in f64 from stage 1's Um/lam (smaller transfer, better
        # precision).
        rc = jnp.stack([r[:mb], c[:mb], jnp.full((mb,), -1.0, r.dtype)
                        .at[0].set(crush.astype(r.dtype))])
        if sb_tri:
            Sb = _sb_tri_blocks(Sb)
    return rc, Sb, phi, c_rest


def _stage2b_dense_body(factor, c_rest, va_grt, *, n: int, mb: int,
                        scaled: bool, interpret: bool = False):
    """Device half 2: the eigenvector tail matmul + assembly.

    `factor` is the pre-scaled diag(c) phi when `scaled` (small-image fused
    path and the XLA fallback — rows < m already exact zeros), else the
    unscaled padded phi whose c_rest scaling is fused into the Pallas matmul
    so cphi never materializes (large-image path). va_grt is the host
    chain's (mb, 2k) [Va | GrT] upload, rows at and beyond the true m
    zero-padded; because the factor's rows < m are zero (c is masked there)
    and Va's rows >= m are zero, the final V assembles as tail-product plus
    an additive Va overlay — no m-dependent slicing, so one compiled
    program serves every rank in the bucket.

    SPLIT layout (factor is the TUPLE (phib_pad,) — the split-buffer
    stage 2a, resolve_split_stage2): va_grt is instead the single-k
    [top (p, k); GrT (mb, k)] upload from pack_stage2b_upload — the host
    computed the top-block V rows in f64 (the sharded protocol,
    parallel/sharded.py element_host_chain) — and the device work is one
    fused scaled matmul over the rest block plus a row concat."""
    with jax.default_matmul_precision("highest"):
        if isinstance(factor, tuple):
            from nle_tpu.ops.pallas.scaled_matmul_kernel import (
                scaled_matmul_pallas,
            )

            (phib_pad,) = factor
            p = va_grt.shape[0] - mb
            top = va_grt[:p]
            grt = va_grt[p:]
            k = grt.shape[1]
            kpad = -(-k // 128) * 128
            grt_pad = jnp.zeros((phib_pad.shape[1], kpad), jnp.float32)
            grt_pad = jax.lax.dynamic_update_slice(
                grt_pad, grt.astype(jnp.float32), (0, 0))
            vb = scaled_matmul_pallas(phib_pad, c_rest, grt_pad,
                                      interpret=interpret)[:n - p, :k]
            return jnp.concatenate([top, vb.astype(va_grt.dtype)], axis=0)
        k = va_grt.shape[1] // 2
        Va = va_grt[:, :k]
        GrT = va_grt[:, k:]
        mpad = factor.shape[1]
        if scaled:
            grt = GrT
            if mpad > mb:
                grt = jnp.zeros((mpad, k), GrT.dtype).at[:mb].set(GrT)
            # N-scale tail GEMM: NLE_STAGE2_DOTS-gated like the Sb gram
            # (f64-dtype runs keep the plain dot — the split is f32-only).
            if factor.dtype == jnp.float32:
                V = stage2_matmul(factor, grt.astype(jnp.float32), "v")[:n]
                V = V.astype(va_grt.dtype)
            else:
                V = (factor @ grt)[:n]
        else:
            from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_matmul_pallas

            kpad = -(-k // 128) * 128
            grt_pad = jnp.zeros((mpad, kpad), jnp.float32)
            grt_pad = jax.lax.dynamic_update_slice(
                grt_pad, GrT.astype(jnp.float32), (0, 0))
            V = scaled_matmul_pallas(factor, c_rest, grt_pad,
                                     interpret=interpret)[:n, :k]
            V = V.astype(va_grt.dtype)
        return V.at[:mb].add(Va)


train_filter_stage2b = functools.partial(
    jax.jit, static_argnames=("n", "mb", "scaled", "interpret")
)(_stage2b_dense_body)


def _apply_u8_body(V, fs, y):
    """V diag(fs) V^T y with the clamp-to-u8 epilogue ((N,) or (N, C)
    channels) — the SINGLE source of the u8 apply algebra: apply_filter_u8
    wraps it and the fused stage-2b variants inline it, so the standalone
    and fused edits cannot drift."""
    c = y.astype(V.dtype)
    one_d = c.ndim == 1
    if one_d:
        c = c[:, None]
    filtered = V @ (fs[:, None] * (V.T @ c))
    out = jnp.clip(jnp.rint(filtered), 0, 255).astype(jnp.uint8)
    return out[:, 0] if one_d else out


@functools.partial(jax.jit, static_argnames=("n", "mb", "scaled", "interpret"))
def train_filter_stage2b_edit(factor, c_rest, va_grt, y, fs, *, n: int,
                              mb: int, scaled: bool, interpret: bool = False):
    """Stage 2b with the FIRST edit's apply fused in: the train->edit flow
    (enhance CLI, NLE_BENCH_MODE=single) otherwise pays one extra device
    dispatch (~30-60 ms tunnel round trip) for an apply whose inputs — V
    just built, the training channel y already resident — are all on
    device at stage-2b time. fs is f(S) for the requested edit weights
    (computed by the same jitted transform the standalone edit uses, so
    the spectra match bit-for-bit). Returns (V, filtered u8 packed)."""
    with jax.default_matmul_precision("highest"):
        V = _stage2b_dense_body(factor, c_rest, va_grt, n=n, mb=mb,
                                scaled=scaled, interpret=interpret)
        return V, _apply_u8_body(V, fs, y[:n])


@functools.partial(
    jax.jit,
    static_argnames=("p", "mb", "n_sinkhorn_iter", "eps", "interpret",
                     "sb_tri"),
)
def train_filter_stage2a_streaming(
    y, rr, cc, stage1_packed, sw, pw,
    *, p: int, mb: int, n_sinkhorn_iter: int, eps: float,
    interpret: bool = False, sb_tri: bool = False,
):
    """phi-free device half 1 for images whose phi would not fit in HBM:
    Sinkhorn and the Sb gram recompute affinity tiles on the fly
    (ops/pallas/streaming_kernel.py) — per-pixel HBM state is just the
    features and the balancing vectors. Returns (rc (2, mb), Sb (mb, mb),
    c (N,)) — rc/Sb split so the caller can overlap the Sb fetch with the
    host chain's eig(Wa) phase (see train_filter_stage2a).
    Shapes are static in the rank bucket mb (see bucket_m); the true m rides
    in stage1_packed and drives only the c mask at the balanced-block
    boundary. Dense sampling grids dispatch to the two-pass p-tiled
    halfstep and the XLA-tiled gram — any (p, m) is supported."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        gram_fits_vmem,
        pad_stream_operands,
        streaming_scaled_gram_pallas,
        streaming_scaled_gram_xla,
        streaming_sinkhorn_vectors,
    )

    with jax.default_matmul_precision("highest"):
        Um, lam_m, Uinv, m_dyn = _unpack_stage1(stage1_packed, p)
        f = features(rr, cc, y)
        fa, fb = f[:p], f[p:]
        r, c = streaming_sinkhorn_vectors(
            fa, fb, Um, lam_m, Uinv, n_sinkhorn_iter, eps, sw, pw,
            interpret=interpret)
        # Sb over the packed rows below the balanced-block boundary m:
        # rows m..p come from the stored Um block (tiny, XLA; rows < m are
        # masked to zero, contributing exact zeros); rows p..N are streamed.
        cu = jnp.where(jnp.arange(p) >= m_dyn, c[:p], 0.0)[:, None] * Um
        Sb_top = cu.T @ cu
        q = fb.shape[0]
        fa_rows, fb_cols, _ = pad_stream_operands(fa, fb)
        qpad = fb_cols.shape[1]
        ppad = fa_rows.shape[1]
        mpad = -(-mb // 128) * 128
        c_row = jnp.pad(c[p:], (0, qpad - q))[None, :]
        if gram_fits_vmem(p, mb):
            uinv_pad = jnp.pad(Uinv.astype(jnp.float32),
                               ((0, ppad - p), (0, mpad - mb)))
            Sb_rest = streaming_scaled_gram_pallas(
                fa_rows, fb_cols, c_row, uinv_pad, sw, pw,
                interpret=interpret)[:mb, :mb]
        else:
            Sb_rest = streaming_scaled_gram_xla(
                fa, fb_cols, c_row, Uinv.astype(jnp.float32), sw, pw)
        Sb = Sb_top + Sb_rest
        if sb_tri:
            # Same lower-triangle block pack as the dense stage 2a
            # (submit_sb_fetch auto-detects the layout by shape).
            Sb = _sb_tri_blocks(Sb)
        rc = jnp.stack([r[:mb], c[:mb]])
    return rc, Sb, c


# The streaming Vb build's Pallas output is 128-lane padded (512 B/pixel
# whatever k is); past this bound the build runs in row slabs so the
# padded intermediate never exceeds one slab (see _stage2b_streaming_body).
# 3 GiB keeps every golden/bench shape (<= 8 MP trains to date) on the
# whole-image call — bit-identical either way, but no reason to churn
# compiled programs for sizes that already fit.
_VB_BUILD_BYTES_LIMIT = int(os.environ.get("NLE_VB_BUILD_BYTES",
                                           str(3 << 30)))
# (slab, 128) f32 = 1 GiB per slab; env override is for tests (tiny
# slabs force the chunked path on small images). Must be a TILE_Q (512)
# multiple.
_VB_SLAB_ROWS = int(os.environ.get("NLE_VB_SLAB_ROWS", str(2 << 20)))
if _VB_SLAB_ROWS <= 0 or _VB_SLAB_ROWS % 512:
    raise ValueError(
        f"NLE_VB_SLAB_ROWS={_VB_SLAB_ROWS}: must be a positive multiple "
        "of 512 (the affinity builder's TILE_Q row alignment)")


def _stage2b_streaming_body(
    y, rr, cc, stage1_packed, sw, pw, c, va_grt,
    *, p: int, mb: int, interpret: bool = False,
):
    """phi-free device half 2: the eigenvector tail.

    V rows m..p come from the Um block (rows < m masked to zero, then the
    host-computed Va — zero beyond m — is added on top: mb <= p, so the
    overlay is a static-slice add); rows p..N collapse to one fused affinity
    matmul with the SMALL right factor Uinv @ GrT (p, k) — the (N, m) phi
    never exists, only the (N, k) result."""
    from nle_tpu.ops.affinity import affinity_matmul_xla
    from nle_tpu.ops.pallas.affinity_kernel import (
        affinity_matmul_pallas,
        ptiled_fits,
    )

    with jax.default_matmul_precision("highest"):
        Um, _, Uinv, m_dyn = _unpack_stage1(stage1_packed, p)
        k = va_grt.shape[1] // 2
        Va = va_grt[:, :k]
        GrT = va_grt[:, k:]
        f = features(rr, cc, y)
        fa, fb = f[:p], f[p:]
        cu = jnp.where(jnp.arange(p) >= m_dyn, c[:p], 0.0)[:, None] * Um
        V_head = (cu @ GrT).at[:mb].add(Va)
        B = Uinv.astype(jnp.float32) @ GrT.astype(jnp.float32)     # (p, k)
        q = fb.shape[0]
        if ptiled_fits(k) and 512 * q > _VB_BUILD_BYTES_LIMIT:
            # SLAB-CHUNKED Vb build for very large images. Two memory
            # facts drive this shape (r5 capacity sweep, 16 MP repro):
            # (1) the Pallas builder materializes its output 128-LANE
            # padded — 512 B/pixel regardless of k — so one whole-image
            # call peaks at 8.2 GiB for 16 MP; (2) ANY (N, k<=128) f32
            # array costs the same 512 B/pixel on TPU (T(8,128) minor-dim
            # padding), so the final V itself is ~8 GiB at 16 MP and a
            # second N-scale temp (a concat or trailing slice copy) OOMs
            # the chip. Hence: ONE exactly-sized (n, k) output buffer,
            # V_head + each slab written in place via dynamic-update-
            # slice inside a fori_loop (XLA keeps the loop carry
            # in-place), the ragged tail via one padded kernel call.
            # Bit-exact vs the whole-image call: each output row is an
            # independent dot over the p samples.
            slab = _VB_SLAB_ROWS
            n_full = q // slab
            out = jnp.zeros((p + q, k), jnp.float32)
            out = jax.lax.dynamic_update_slice(
                out, V_head.astype(jnp.float32), (0, 0))
            c_rest = c[p:]

            def body(i, acc):
                fb_s = jax.lax.dynamic_slice(fb, (i * slab, 0), (slab, 3))
                cs = jax.lax.dynamic_slice(c_rest, (i * slab,), (slab,))
                vb = affinity_matmul_pallas(fa, fb_s, B, sw, pw,
                                            interpret=interpret)
                return jax.lax.dynamic_update_slice(
                    acc, cs[:, None] * vb, (p + i * slab, 0))

            out = jax.lax.fori_loop(0, n_full, body, out)
            rem = q - n_full * slab
            if rem:
                rpad = -(-rem // 512) * 512       # TILE_Q multiple
                fb_t = jnp.pad(fb[n_full * slab:], ((0, rpad - rem),
                                                    (0, 0)))
                vb_t = affinity_matmul_pallas(fa, fb_t, B, sw, pw,
                                              interpret=interpret)[:rem]
                out = jax.lax.dynamic_update_slice(
                    out, c_rest[n_full * slab:, None] * vb_t,
                    (p + n_full * slab, 0))
            return out.astype(va_grt.dtype)
        if ptiled_fits(k):
            Vb_raw = affinity_matmul_pallas(fa, fb, B, sw, pw,
                                            interpret=interpret)
        else:
            # Very wide eigenvector requests exceed the Pallas kernel's
            # VMEM budget — the tiled XLA builder has no width bound.
            Vb_raw = affinity_matmul_xla(fa, fb, B, sw, pw)
        Vb = c[p:, None] * Vb_raw
        return jnp.concatenate([V_head, Vb.astype(va_grt.dtype)], axis=0)


train_filter_stage2b_streaming = functools.partial(
    jax.jit, static_argnames=("p", "mb", "interpret")
)(_stage2b_streaming_body)


@functools.partial(jax.jit, static_argnames=("p", "mb", "interpret"))
def train_filter_stage2b_streaming_edit(
    y, rr, cc, stage1_packed, sw, pw, c, va_grt, fs,
    *, p: int, mb: int, interpret: bool = False,
):
    """Streaming stage 2b with the first edit's apply fused in (see
    train_filter_stage2b_edit). Returns (V packed, filtered u8 packed)."""
    with jax.default_matmul_precision("highest"):
        V = _stage2b_streaming_body(y, rr, cc, stage1_packed, sw, pw, c,
                                    va_grt, p=p, mb=mb, interpret=interpret)
        return V, _apply_u8_body(V, fs, y)


@functools.partial(jax.jit, static_argnames=("p", "mb"))
def factored_filter_pieces(stage1_packed, c, va_grt, *, p: int, mb: int):
    """Small matrices of the V-FREE factored filter (models/factored.py):
    V_head (p, k) — the sampled-pixel rows of V (cu @ GrT with the Va
    overlay, as in train_filter_stage2b_streaming) — and W = Uinv @ GrT
    (p, k), the tail generator: V_rest = c_rest * (K_AB^T @ W), recomputed
    from features at APPLY time instead of storing the (N, k) V."""
    with jax.default_matmul_precision("highest"):
        Um, _, Uinv, m_dyn = _unpack_stage1(stage1_packed, p)
        k = va_grt.shape[1] // 2
        Va = va_grt[:, :k]
        GrT = va_grt[:, k:]
        cu = jnp.where(jnp.arange(p) >= m_dyn, c[:p], 0.0)[:, None] * Um
        V_head = (cu @ GrT).at[:mb].add(Va)
        W = Uinv.astype(jnp.float32) @ GrT.astype(jnp.float32)
        return V_head, W


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def factored_apply(y, y_train, rr, cc, c, v_head, w, f_eigvals, sw, pw,
                   *, p: int, interpret: bool = False):
    """filtered = V diag(f(S)) V^T y WITHOUT a stored V: the tail rows of V
    are regenerated from the training features per application. Two
    streaming affinity passes (K_AB @ x for the projection, K_AB^T @ small
    for the output) + O(k) matmuls; per-pixel state is features + c — the
    capacity path past the (N, k) V.

    y is (N,) or (C, N) packed — multiple channels (the denoise path
    filters both chroma planes with one filter, reference
    src/filter.cpp:388-389) ride the SAME two streaming passes as extra
    kernel rows, not extra pass-pairs. The channel axis LEADS (row-major
    in N — the streaming-kernel layout rule: an (N, C) device array gets
    its minor dim padded to 128 lanes, 64x the physical bytes at C = 2,
    which measured SLOWER than two single-channel passes at 8 MP).
    y_train (N,); returns y's shape ((N,) or (C, N))."""
    from nle_tpu.ops.pallas.streaming_kernel import (
        pad_stream_operands,
        streaming_ap_pallas,
        streaming_atb_pallas,
    )

    with jax.default_matmul_precision("highest"):
        ft = features(rr, cc, y_train)
        fa, fb = ft[:p], ft[p:]
        q = fb.shape[0]
        y = y.astype(jnp.float32)
        one_d = y.ndim == 1
        if one_d:
            y = y[None, :]
        cy = c[None, p:] * y[:, p:]                          # (C, q)
        if interpret:
            from nle_tpu.ops.affinity import affinity_matmul_xla

            ap = affinity_matmul_xla(fb, fa, cy.T, sw, pw).T  # (C, p)
        else:
            fa_rows, fb_cols, _ = pad_stream_operands(fa, fb)
            qpad = fb_cols.shape[1]
            cy = jnp.pad(cy, ((0, 0), (0, qpad - q)))
            ap = streaming_ap_pallas(fa_rows, fb_cols, cy, sw, pw)[:, :p]
        proj = y[:, :p] @ v_head + ap @ w                    # (C, k)
        t = proj * f_eigvals[None, :]
        out_head = t @ v_head.T                              # (C, p)
        b = t @ w.T                                          # (C, p)
        if interpret:
            from nle_tpu.ops.affinity import affinity_matmul_xla

            tail = affinity_matmul_xla(fa, fb, b.T, sw, pw).T  # (C, q)
        else:
            # Dedicated row-output kernel: the general affinity matmul
            # pads its output to 128 lanes (512 B/px — a no-go at the
            # capacity sizes the factored path exists for).
            ppad = fa_rows.shape[1]
            tail = streaming_atb_pallas(
                fa_rows, fb_cols, jnp.pad(b, ((0, 0), (0, ppad - p))),
                sw, pw)[:, :q]
        out = jnp.concatenate([out_head, c[None, p:] * tail], axis=1)
        return out[0] if one_d else out


@jax.jit
def _scatter_rows(V_packed, inv_perm):
    """Packed -> pixel-order rows as a GATHER by the inverse permutation:
    out[i] = V_packed[inv_perm[i]]. The scatter form
    (zeros.at[perm].set(V)) hit RESOURCE_EXHAUSTED through the axon
    plugin at N = 1M rows (r5 capacity sweep); the gather lowers to a
    plain dynamic-gather with no update-combiner buffers. Same result:
    out[perm[j]] = V_packed[j]."""
    return V_packed[inv_perm]


@functools.partial(jax.jit, static_argnames=("dtype",))
def _cast_channel(y_u8, dtype):
    return y_u8.astype(dtype)


def train_filter(
    channel,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int = 10,
    n_eig_vectors: int = 5,
    *,
    eps: float | None = None,
    dtype=None,
    grid: SampleGrid | None = None,
    use_pallas: bool | None = None,
    eigh_method: str | None = None,
    stage1: str = "host64",
    pixel_order: bool = True,
    streaming: bool | None = None,
    packed_y_dev: jax.Array | None = None,
    edit_weights=None,
):
    """Train the nonlocal filter on a single channel (H, W).

    Host-level wrapper: builds the static SampleGrid, packs the channel,
    resolves stage 1 (Ka eigensystem; "host64" = float64 LAPACK on host,
    "topk" = the reference's USE_SPECTRA iterative solver with doubling k,
    "device" = jitted on-device), runs the jitted stage 2, and (by default)
    scatters eigenvectors back to pixel order (the reference's
    `m_eigvecs = P * V`, src/filter.cpp:502). With pixel_order=False the
    packed [selected; rest] row order is returned instead — callers that
    hold the SampleGrid (the model layer) permute on the host, which is much
    cheaper than an (N, k) device scatter.

    Returns (eigvecs (N, k), eigvals (k,)).

    edit_weights: detail-layer weights for a FUSED first edit (the
    train->edit flow): the apply V diag(f(S)) V^T y on the TRAINING channel
    is folded into the stage-2b device program, saving one dispatch round
    trip per frame on a tunnel-attached chip. Requires pixel_order=False
    (the caller holds the grid and unscatters on the host). Returns
    (eigvecs, eigvals, filtered u8 packed device array) instead.
    """
    channel_np = np.asarray(channel)
    if dtype is None:
        dtype = (channel_np.dtype if np.issubdtype(channel_np.dtype, np.floating)
                 else np.float32)
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        # Without x64, "float64" arrays silently become f32 on device — and
        # the float64 branch skips the host-f64 chain the f32 path needs for
        # fidelity. Fall back to the real f32 pipeline instead.
        logger.warning(
            "float64 requested but jax_enable_x64 is off; using the float32 "
            "pipeline (host-f64 eigensolver chain) instead."
        )
        dtype = jnp.dtype(jnp.float32)
    if eps is None:
        eps = default_eps(dtype)
    if edit_weights is not None and pixel_order:
        raise ValueError(
            "edit_weights requires pixel_order=False (the caller holds "
            "the SampleGrid and unscatters the u8 result on the host).")
    if eigh_method is None:
        # f32 device runs: the orthogonalization small-matrix chain must be
        # f64 on the host — f32 chain arithmetic costs ~25 dB on golden
        # configs whose Ka spectrum reaches the eps cutoff. f64 runs: XLA
        # (== LAPACK) on device matches the oracle to 1e-15.
        eigh_method = "xla" if dtype == jnp.float64 else "host64-chain"
    nrows, ncols = channel_np.shape
    if grid is None:
        grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)

    perm, rr, cc = _grid_device_arrays(grid, dtype)
    # Pack on the host and ship integer-valued channels as uint8 (4x less
    # transfer; L channels are always 8-bit-valued). A caller that already
    # holds the packed channel on the device (the model layer's train->edit
    # flow) passes it via packed_y_dev and skips the upload entirely.
    if packed_y_dev is not None:
        y = (_cast_channel(packed_y_dev, dtype)
             if packed_y_dev.dtype != dtype else packed_y_dev)
    else:
        packed_np, is_8bit = pack_channel(channel_np, grid.perm)
        if is_8bit:
            y = _cast_channel(jnp.asarray(packed_np), dtype)
        else:
            y = jnp.asarray(packed_np.astype(dtype))
    sw, pw = bandwidth_weights(hx, hy, dtype)
    p = grid.n_samples

    with stage("Computing kernel"):  # + Nystrom eigh (reference stage prints)
        if stage1 in ("host64", "topk"):
            # "topk" = the reference's USE_SPECTRA solver for eig(Ka)
            # (src/filter.cpp:169-200) with doubling k; same downstream.
            s1_fn = ka_eigh_host64 if stage1 == "host64" \
                else ka_eigh_topk_host64
            Um64, lam64, Uinv64 = s1_fn(
                channel_np[grid.sel_rows, grid.sel_cols].astype(np.float64),
                grid.sel_rows, grid.sel_cols, hx, hy, float(eps),
            )
            m = lam64.shape[0]
            dev_s1 = None
        else:
            U, lam = ka_eigh_stage(
                y, rr, cc, sw, pw, p=p, eps=float(eps), eigh_method=eigh_method
            )
            m = int(np.count_nonzero(np.asarray(lam)))
            Um = U[:, :m]
            lam_m = lam[:m]
            dev_s1 = (Um, lam_m)
            Um64 = np.asarray(Um, np.float64)
            lam64 = np.asarray(lam_m, np.float64)
    if m == 0:
        raise ValueError("Affinity matrix Ka has no eigenvalues above eps.")
    warn_truncation(p, m, float(eps))

    if eigh_method == "host64-chain":
        mb = bucket_m(m, p)
        if dev_s1 is not None:
            # stage1='device': the eigensystem is already device-resident —
            # pad to the bucket and append the m digits on device instead
            # of a host->device re-upload (~30-60 ms on the tunnel).
            Um_d, lam_d = dev_s1
            stage1_dev = pack_stage1_device(Um_d, lam_d, m, mb, dtype)
        else:
            stage1_dev = jnp.asarray(pack_stage1(Um64, lam64,
                                                 np.dtype(dtype), mb=mb))
        pallas_ok = (jax.default_backend() == "tpu" if use_pallas is None
                     else use_pallas)
        if dtype != jnp.float32:
            if streaming:
                raise ValueError(
                    "streaming stage 2 is float32-only (the Pallas kernels "
                    f"compute in f32); got dtype {jnp.dtype(dtype).name}.")
            streaming = False
        elif streaming is None:
            from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_fits_vmem
            from nle_tpu.ops.pallas.sinkhorn_kernel import padded_shape

            npad_, mpad_ = padded_shape(grid.n_pixels, mb)
            phi_bytes = 4 * npad_ * mpad_
            # Streaming also when the fused dense kernels cannot fit VMEM
            # (very wide rank buckets) AND the cphi fallback would blow the
            # byte budget — the streaming stage 2 handles any (p, m) via
            # its p-tiled halfstep.
            streaming = pallas_ok and (
                phi_bytes > _STREAM_BYTES_LIMIT
                or (phi_bytes > _CPHI_BYTES_LIMIT
                    and not scaled_fits_vmem(mpad_)))
        interpret_stream = jax.default_backend() != "tpu"
        with stage("Nystrom approximation + Sinkhorn"):
            if streaming:
                logger.info(
                    "using the phi-free streaming stage 2 for phi "
                    "(%d x %d) (requested, or past the NLE_STREAM_BYTES/"
                    "VMEM capacity rules).", grid.n_pixels, m)
                rc_dev, sb_dev, c_full = train_filter_stage2a_streaming(
                    y, rr, cc, stage1_dev, sw, pw,
                    p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter,
                    eps=float(eps), interpret=interpret_stream,
                    sb_tri=resolve_sb_tri(),
                )
            else:
                from nle_tpu.ops.pallas.sinkhorn_kernel import (
                    resolve_split_stage2,
                )

                rc_dev, sb_dev, phi_store, c_rest = train_filter_stage2a(
                    y, rr, cc, stage1_dev, sw, pw,
                    p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter, eps=float(eps),
                    use_pallas=use_pallas,
                    small=stage2_dense_small(grid.n_pixels, mb),
                    split=resolve_split_stage2(n_sinkhorn_iter),
                    sb_tri=resolve_sb_tri(),
                )
            # The MB-sized Sb fetch is submitted FIRST so it rides the
            # tunnel concurrently with the tiny blocking rc fetch (requests
            # pipeline; measured: Sb-in-hand ~124 -> ~94 ms with the rc
            # latency unchanged) and with the host chain's eig(Wa) phase
            # (host_orthogonalize resolves it late).
            sb_resolve = submit_sb_fetch(sb_dev)
            rc_np = np.asarray(rc_dev, np.float64)
            redo = check_carrier_guard(rc_np)
            if redo:
                # Out-of-domain input for the int16 carrier (crush
                # statistic over threshold, VERDICT r4 #2): retrain this
                # image through the bit-pinned assembled f32 trajectory.
                # Rare by construction (every golden config measures
                # <= 0.09 vs the 0.2 default threshold), so the doubled
                # stage-2a cost applies only to inputs the carrier would
                # silently destroy.
                # The first attempt's in-flight Sb fetch is simply
                # abandoned (reviewed r5): cancelling it would need a
                # future handle through submit_sb_fetch, and deferring
                # the FIRST submit until after this check would cost the
                # COMMON path its measured Sb/rc request overlap
                # (~30 ms/frame) to optimize a rare fallback.
                rc_dev, sb_dev, phi_store, c_rest = train_filter_stage2a(
                    y, rr, cc, stage1_dev, sw, pw,
                    p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter,
                    eps=float(eps), use_pallas=use_pallas,
                    small=stage2_dense_small(grid.n_pixels, mb),
                    split=False, int16=False, sb_tri=resolve_sb_tri(),
                )
                sb_resolve = submit_sb_fetch(sb_dev)
                rc_np = np.asarray(rc_dev, np.float64)
        k = min(n_eig_vectors, m)
        with stage("Orthogonalize"):
            # Rebuild the balanced-block small matrices in f64 on the host
            # from stage 1's f64 eigensystem (cheaper than fetching them and
            # slightly more accurate).
            va_np, Sq = host_orthogonalize(rc_np, sb_resolve, Um64, lam64,
                                           m, mb, k, float(eps))
            split = (not streaming) and isinstance(phi_store, tuple)
            va_grt = jnp.asarray(
                pack_stage2b_upload(split, va_np, rc_np, Um64, m, p, k),
                dtype)  # one host->device transfer
            S = jnp.asarray(Sq, dtype)
            fs = None
            if edit_weights is not None:
                from nle_tpu.ops.transform import transform_eigenvalues

                # The SAME jitted transform the standalone edit dispatches,
                # on the same device S — identical f(S) bits.
                fs = transform_eigenvalues(S, edit_weights)
            if streaming:
                if fs is not None:
                    V_packed, edit_out = train_filter_stage2b_streaming_edit(
                        y, rr, cc, stage1_dev, sw, pw, c_full, va_grt, fs,
                        p=p, mb=mb, interpret=interpret_stream,
                    )
                else:
                    V_packed = train_filter_stage2b_streaming(
                        y, rr, cc, stage1_dev, sw, pw, c_full, va_grt,
                        p=p, mb=mb, interpret=interpret_stream,
                    )
            else:
                scaled = stage2b_factor_scaled(grid.n_pixels, mb, dtype,
                                               use_pallas)
                if fs is not None:
                    V_packed, edit_out = train_filter_stage2b_edit(
                        phi_store, c_rest, va_grt, y, fs, n=grid.n_pixels,
                        mb=mb, scaled=scaled,
                    )
                else:
                    V_packed = train_filter_stage2b(
                        phi_store, c_rest, va_grt, n=grid.n_pixels, mb=mb,
                        scaled=scaled,
                    )
    else:
        if streaming:
            raise ValueError(
                "streaming stage 2 requires the default host64-chain "
                f"pipeline; got eigh_method={eigh_method!r}.")
        with stage("Nystrom approximation + Sinkhorn + Orthogonalize"):
            if dev_s1 is not None:
                Um, lam_m = dev_s1
                Uinv = Um * safe_reciprocal(lam_m, float(eps))[None, :]
            else:
                Um = jnp.asarray(Um64, dtype)
                lam_m = jnp.asarray(lam64, dtype)
                Uinv = jnp.asarray(Uinv64, dtype)
            V_packed, S = train_filter_stage2(
                y, rr, cc, Um, lam_m, Uinv, sw, pw,
                p=p,
                m=m,
                n_sinkhorn_iter=n_sinkhorn_iter,
                n_eig_vectors=n_eig_vectors,
                eps=float(eps),
                use_pallas=use_pallas,
                eigh_method=eigh_method,
            )
        if edit_weights is not None:
            # Non-split pipelines (f64 / device-chain) have no stage 2b to
            # fuse into — run the standalone apply (correctness paths only).
            from nle_tpu.ops.transform import transform_eigenvalues

            fs = transform_eigenvalues(S, edit_weights)
            edit_out = apply_filter_u8(V_packed, fs, y)
    if edit_weights is not None:
        return V_packed, S, edit_out
    if not pixel_order:
        return V_packed, S
    inv_perm = np.empty_like(grid.perm)
    inv_perm[grid.perm] = np.arange(grid.perm.shape[0])
    return _scatter_rows(V_packed, jnp.asarray(inv_perm)), S


@jax.jit
def apply_filter(eigvecs: jax.Array, f_eigvals: jax.Array, channel: jax.Array):
    """filtered = V diag(f(S)) V^T c on a flattened channel.

    Semantics of NLEFilter::apply (src/filter.cpp:445-458): two skinny
    (N, k) MXU matmuls.
    """
    with jax.default_matmul_precision("highest"):
        shape = channel.shape
        c = channel.reshape(-1).astype(eigvecs.dtype)
        filtered = eigvecs @ (f_eigvals * (eigvecs.T @ c))
        return filtered.reshape(shape)


@jax.jit
def apply_filter_u8(eigvecs: jax.Array, f_eigvals: jax.Array, y_u8: jax.Array):
    """apply_filter specialized for 8-bit channels with the reference's
    clamp-to-[0,255]-and-round epilogue (src/filter.cpp:434-436) fused in:
    uint8 in, uint8 out — 4x less host<->device traffic per edit.

    y_u8 may be (N,) or (N, C): multiple channels (the denoise path filters
    both chroma planes with one filter, src/filter.cpp:388-389) go through
    a single pair of MXU matmuls and one device round trip."""
    with jax.default_matmul_precision("highest"):
        return _apply_u8_body(eigvecs, f_eigvals, y_u8)
