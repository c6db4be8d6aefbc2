"""Multi-chip sharded training and application of the nonlocal filter.

The reference is strictly single-threaded single-process (OpenMP commented
out of its build, reference CMakeLists.txt:40-46); this module is new
capability. Parallel layout over a 2D ('data', 'pixel') `jax.sharding.Mesh`:

- 'data'  — batch of independent channels/images (the reference's denoise
  path already applies one filter to 2 chroma channels, src/filter.cpp:388).
- 'pixel' — the N dimension: phi_b rows, Sinkhorn vectors, and V rows are
  sharded; every cross-shard reduction is an m- or (m, m)-sized `psum`
  riding ICI:
    * Sinkhorn's phi^T x contraction (2 psums per half-iteration),
    * Sb = phi_b^T diag(c_b)^2 phi_b in the factored orthogonalization,
    * V^T c in `apply`.
  All p-sized work (Ka eigensystem slices, the small-matrix chain) is
  replicated per device — it is O(p^2..p^3) on a few-hundred-sized matrix,
  cheaper than communicating it.

Block boundary: as in ops/pipeline.py, the balanced Wa block sits at the
kept-eigenvalue count m (reference src/filter.cpp:247 uses p = phi.cols()).
The replicated part of each shard covers all p sampled pixels; only rest
pixels are sharded. Shapes are static in the rank bucket mb = bucket_m(m, p)
with each element's true m traced (columns beyond m zero-padded, the Sb
boundary a row mask) — batch elements group per bucket, not per exact rank,
so varied-rank batches share compiled programs.

Padding: the rest-pixel count (N - p) is zero-padded to a multiple of the
pixel-axis size; pad rows of phi_b are masked to exact zeros, which makes
every pad contribution vanish (reciprocals of 0 are 0 by the eps rule).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nle_tpu.config import default_eps
from nle_tpu.ops.affinity import (
    affinity_matmul,
    affinity_matmul_xla,
    bandwidth_weights,
    features,
)
from nle_tpu.ops.linalg import safe_reciprocal
from nle_tpu.ops.sampling import sample_grid
from nle_tpu.utils.transfer import fetch


def _sharded_2a_step(mesh: Mesh, p: int, mb: int, n_iter: int, eps: float,
                     use_pallas: bool):
    """Jitted shard_map training step, cached per (mesh, shape config) —
    rebuilding the closure per call would retrace and recompile every time
    (minutes on a remote-compile TPU). Shapes are static in the rank bucket
    mb (ops/pipeline.py bucket_m); each batch element carries its true kept
    rank m as a traced scalar.

    The Sb gram's NLE_STAGE2_DOTS mode is resolved HERE (uncached, from the
    mesh platform) and threaded into the cached builder as part of its key,
    so a mid-process env change selects a different compiled program
    instead of silently reusing a trace built under the old mode (ADVICE
    r3)."""
    from nle_tpu.ops.precision import stage2_dots

    return _sharded_2a_step_cached(
        mesh, p, mb, n_iter, eps, use_pallas,
        stage2_dots("gram", on_tpu=use_pallas))


@functools.lru_cache(maxsize=32)
def _sharded_2a_step_cached(mesh: Mesh, p: int, mb: int, n_iter: int,
                            eps: float, use_pallas: bool, gram_mode: str):
    def fn(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, sw, pw):
        return _train_2a(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local,
                         p=p, n_iter=n_iter, eps=eps, sw=sw, pw=pw,
                         use_pallas=use_pallas, gram_mode=gram_mode)

    vfn = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    sharded = jax.shard_map(
        vfn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data", "pixel"), P("data", "pixel"), P(), P()),
        out_specs=(P("data"), P("data"), P("data"),
                   P("data", "pixel")),
    )
    return jax.jit(sharded)


def _sharded_int16(on_tpu: bool) -> bool:
    """Whether the DENSE sharded trainer streams the int16 per-column-
    scaled Sinkhorn carrier (the single-chip fused path's default —
    ops/pallas/sinkhorn_kernel.py _resolve_int16 — ported to the pixel
    mesh, VERDICT r3 item 2). Same knob, same scoping: NLE_SINKHORN_INT16
    auto (default) engages on TPU meshes only — on a CPU mesh there is no
    MXU-pass wall, and the f32 path is the bit-exact machinery-comparison
    baseline (tools/check_tpu_sharded.py pins =off). "on" forces it on any
    mesh: CPU-mesh tests certify the quantized trajectory off-chip through
    the plain-XLA twin of the kernel's split arithmetic
    (sinkhorn_halfstep_split_xla). Resolved per CALL (the cached step
    builders are keyed by the outcome), so a mid-process change selects a
    different compiled program instead of silently no-opping."""
    raw = os.environ.get("NLE_SINKHORN_INT16", "auto").lower()
    if raw in ("off", "0", "false"):
        return False
    if raw not in ("auto", "on", "1", "true"):
        raise ValueError(
            f"NLE_SINKHORN_INT16={raw!r}: expected auto/on/off")
    return on_tpu or raw != "auto"


def _sharded_guard_trips(crush) -> bool:
    """Host side of the sharded int16-carrier validity guard: fetch the
    per-element global crush fractions (a (B,) psum'd statistic from
    _train_2a_q) and hand the worst to the ONE shared policy
    (sinkhorn_kernel.carrier_guard_decision — same threshold resolve,
    forced-on override, and warn-and-continue semantics as the
    single-chip check_carrier_guard). Skips the tiny fetch entirely when
    the guard is off."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        carrier_guard_decision,
        resolve_int16_guard,
    )
    from nle_tpu.utils.logging import logger

    if resolve_int16_guard() is None:
        return False
    worst = float(np.asarray(fetch(crush)).max())
    return carrier_guard_decision(worst, logger, "worst crush",
                                  "retraining this group")


def _sharded_2a_step_q(mesh: Mesh, p: int, mb: int, n_iter: int, eps: float,
                       on_tpu: bool):
    """int16-carrier variant of _sharded_2a_step (same contract and out
    shardings; trajectory differs by the carrier's quantization class).
    Batch elements run under lax.map rather than vmap: the manual-DMA
    Sinkhorn kernel (scratch buffers, internal fori_loop, ANY-space refs)
    has no batching rule, and sequential per-element execution loses
    nothing — each element's Sinkhorn alone saturates a chip's HBM."""
    from nle_tpu.ops.precision import stage2_dots

    return _sharded_2a_step_q_cached(
        mesh, p, mb, n_iter, eps, on_tpu,
        stage2_dots("gram", on_tpu=on_tpu))


@functools.lru_cache(maxsize=32)
def _sharded_2a_step_q_cached(mesh: Mesh, p: int, mb: int, n_iter: int,
                              eps: float, on_tpu: bool, gram_mode: str):
    def mapped(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, sw, pw):
        def one(xs):
            Um1, lam1, Ui1, m1, fa1, fb1, mk1 = xs
            return _train_2a_q(Um1, lam1, Ui1, m1, fa1, fb1, mk1,
                               p=p, mb=mb, n_iter=n_iter, eps=eps,
                               sw=sw, pw=pw, on_tpu=on_tpu,
                               gram_mode=gram_mode)

        return jax.lax.map(one, (Um, lam_m, Uinv, m_dyn, fa, fb_local,
                                 mask_local))

    sharded = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data", "pixel"), P("data", "pixel"), P(), P()),
        out_specs=(P("data"), P("data"), P("data"),
                   P("data", "pixel"), P("data")),
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=32)
def _sharded_2a_step_streaming(mesh: Mesh, p: int, mb: int, n_iter: int,
                               eps: float, interpret: bool):
    """Streaming (phi-free) variant of _sharded_2a_step: each pixel shard
    recomputes its affinity tiles per half-step; outputs are the same except
    the sharded factor is replaced by the sharded c vector (Vb is built by
    _sharded_2b_streaming)."""
    def fn(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, sw, pw):
        return _train_2a_streaming(
            Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local,
            p=p, mb=mb, n_iter=n_iter, eps=eps, sw=sw, pw=pw,
            interpret=interpret)

    vfn = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    sharded = jax.shard_map(
        vfn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data", "pixel"), P("data", "pixel"), P(), P()),
        out_specs=(P("data"), P("data"), P("data"),
                   P("data", "pixel")),
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=32)
def _sharded_2b_streaming(mesh: Mesh, interpret: bool):
    """Vb = c * (K_AB^T @ (Uinv @ GrT)) per pixel shard (streaming path).

    Dispatch goes through affinity_matmul so the ptiled_fits VMEM guard
    applies: a wide eigenvector request (B cols beyond the p-tiled kernel's
    VMEM working set) falls back to the tiled XLA builder exactly like the
    single-chip twin (ops/pipeline.py train_filter_stage2b_streaming)
    instead of failing Mosaic's compile-time VMEM check."""
    def fn(fa, fb_local, cbl_local, B, sw, pw):
        vb = affinity_matmul(fa, fb_local, B, sw, pw,
                             use_pallas=not interpret)
        return cbl_local[:, None] * vb

    vfn = jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None))
    sharded = jax.shard_map(
        vfn,
        mesh=mesh,
        in_specs=(P("data"), P("data", "pixel"), P("data", "pixel"),
                  P("data"), P(), P()),
        out_specs=P("data", "pixel"),
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=32)
def _sharded_apply(mesh: Mesh):
    def body(v_l, c_l, fs):
        # Same precision rule as every device matmul in the pipeline
        # (ops/pipeline.py): default bf16 MXU passes cost ~1 gray level.
        with jax.default_matmul_precision("highest"):
            proj = jax.lax.psum(v_l.T @ c_l, "pixel")
            return v_l @ (fs * proj)

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pixel"), P("pixel"), P()),
            out_specs=P("pixel"),
        )
    )


# Sharded rest-pixel coordinate planes + pad mask, cached per
# (grid, mesh, dtype): static across calls for a fixed image shape and
# sample counts, exactly like pipeline._grid_device_arrays on the
# single-chip path — re-uploading ~8 B/pixel of coordinates per call would
# dominate tunnel-attached-TPU latency in the repeated-training pattern.
_COORD_CACHE: dict = {}


def _coord_rest_arrays(grid, mesh: Mesh, dtype, nb_pad: int):
    key = (grid.nrows, grid.ncols, grid.sel_rows.tobytes(),
           grid.sel_cols.tobytes(), mesh, jnp.dtype(dtype).name, nb_pad)
    hit = _COORD_CACHE.get(key)
    if hit is None:
        p = grid.n_samples
        nb = grid.n_pixels - p
        dt = np.dtype(dtype)
        rr = (grid.perm[p:] // grid.ncols).astype(dt)
        cc = (grid.perm[p:] % grid.ncols).astype(dt)
        sh_pix = NamedSharding(mesh, P("pixel"))
        hit = (
            jax.device_put(np.pad(rr, (0, nb_pad - nb)), sh_pix),
            jax.device_put(np.pad(cc, (0, nb_pad - nb)), sh_pix),
        )
        while len(_COORD_CACHE) > 8:
            # Evict oldest-first (insertion order), not the whole cache —
            # same rationale as pipeline._GRID_CACHE.
            _COORD_CACHE.pop(next(iter(_COORD_CACHE)))
        _COORD_CACHE[key] = hit
    return hit


@functools.lru_cache(maxsize=32)
def _build_feats_step(mesh: Mesh, nb: int, nb_pad: int):
    """Jitted per-shard build of the rest-block features (B, nb_pad, 3) and
    pad mask (B, nb_pad) from the pixel-sharded intensity rows and the
    cached coordinate planes. Everything stays on its own shard: the
    whole-batch feature tensor never exists on one device."""
    sh3 = NamedSharding(mesh, P("data", "pixel", None))
    sh2 = NamedSharding(mesh, P("data", "pixel"))

    def build(yb, rr_rest, cc_rest):
        fb = jax.vmap(lambda y: features(rr_rest, cc_rest, y))(yb)
        valid = (jnp.arange(nb_pad) < nb).astype(yb.dtype)
        mask = jnp.broadcast_to(valid, yb.shape)
        # Zero the pad rows' coordinate columns too (they carry the real
        # pad-row coords of 0 already, but y pads are 0 — keep fb pad rows
        # exactly zero like the jnp.pad-based build did).
        return fb * mask[..., None], mask

    return jax.jit(build, out_shardings=(sh3, sh2))


def make_mesh(n_data: int = 1, n_pixel: int | None = None, devices=None) -> Mesh:
    devices = list(jax.devices() if devices is None else devices)
    if n_pixel is None:
        n_pixel = len(devices) // n_data
    devs = np.array(devices[: n_data * n_pixel]).reshape(n_data, n_pixel)
    return Mesh(devs, ("data", "pixel"))


def _train_2a(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, *, p, n_iter,
              eps, sw, pw, use_pallas=None, gram_mode="highest"):
    """Per-(batch element, pixel-shard) Nystrom + Sinkhorn body under
    shard_map with `psum` over 'pixel'. Um (p, mb), lam_m (mb,), Uinv
    (p, mb) — columns beyond the element's true kept rank m (the traced
    scalar m_dyn) zero-padded; fa (p, 3) replicated across 'pixel';
    fb_local (nb_local, 3); mask_local (nb_local,). Returns the p-row
    balancing vectors and the Sb reduction (replicated) plus the sharded
    scaled factor; the chaos-sensitive orthogonalization chain runs on the
    host in f64 (see ops/pipeline.py precision policy).

    The balanced-block boundary at m only matters for Sb (rows < m are
    excluded) — Sinkhorn itself treats all p sampled rows identically, so
    the old top/u row split collapses into one (p,) vector and m enters
    solely through a row mask."""
    # The affinity kernel vma-annotates its outputs, so the fused Pallas
    # path works inside shard_map(check_vma=True) on TPU; elsewhere this
    # dispatches to the tiled XLA builder.
    phi_bl = (affinity_matmul(fa, fb_local, Uinv, sw, pw,
                              use_pallas=use_pallas)
              * mask_local[:, None])

    def w_matvec(xp, xbl):
        s = Um.T @ xp + jax.lax.psum(phi_bl.T @ xbl, "pixel")
        t = lam_m * s
        return Um @ t, phi_bl @ t

    dt = fa.dtype

    def body(_, state):
        rp, rbl = state[:2]
        wp, wbl = w_matvec(rp, rbl)
        cp = safe_reciprocal(wp, eps)
        cbl = safe_reciprocal(wbl, eps) * mask_local
        wp, wbl = w_matvec(cp, cbl)
        rp = safe_reciprocal(wp, eps)
        rbl = safe_reciprocal(wbl, eps) * mask_local
        return rp, rbl, cp, cbl

    # Loop-carry inits must carry the same varying-axes type as the loop
    # outputs: the replicated p-side vectors vary over 'data' (they are
    # per-batch-element), the sharded rest-side vectors also vary over
    # 'pixel' (mask_local provides that). r = 1 on valid rows as in the
    # reference (pad rows are annihilated by phi's zero rows either way).
    data_varying = lambda x: jax.lax.pcast(x, ("data",), to="varying")
    init = (
        data_varying(jnp.ones((p,), dt)),
        mask_local,
        data_varying(jnp.zeros((p,), dt)),
        jnp.zeros_like(mask_local),
    )
    rp, rbl, cp, cbl = jax.lax.fori_loop(0, n_iter, body, init)

    cphiu = jnp.where(jnp.arange(p) >= m_dyn, cp, 0.0)[:, None] * Um
    cphib_l = cbl[:, None] * phi_bl
    Sb = cphiu.T @ cphiu + jax.lax.psum(_local_gram(cphib_l, gram_mode),
                                        "pixel")
    return rp, cp, Sb, cphib_l


def _local_gram(a, gram_mode: str):
    """Per-shard a^T @ a at the resolved 'gram'-site NLE_STAGE2_DOTS mode
    (ops/precision.py): the N-scale Sb reduction is the one sharded GEMM
    the single-chip auto policy splits on TPU (the split's balanced scaled
    columns make it safe; the phi build is NOT — see the precision-policy
    module docstring). The mode arrives resolved from the step builder's
    cache key, never re-read from the env at trace time."""
    if gram_mode == "high":
        from nle_tpu.ops.precision import dot_general_3pass

        return dot_general_3pass(a, a, (((0,), (0,)), ((), ())))
    return jax.lax.dot_general(
        a, a, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype)


def _train_2a_q(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, *, p, mb,
                n_iter, eps, sw, pw, on_tpu, gram_mode):
    """int16-carrier twin of _train_2a: the per-(batch element, pixel
    shard) dense Nystrom + Sinkhorn body with the balancing sweeps run on
    a per-COLUMN-scaled int16 copy of the local phi block (the single-chip
    fused default — ops/pallas/sinkhorn_kernel.py _resolve_int16 — ported
    to the mesh; matches the dominant reference hot loop, reference
    src/filter.cpp:238-245). Differences vs _train_2a:

    - s-CARRIED loop: only the m-sized reduction s = phi^T x crosses
      half-steps, and the fused kernel folds the reciprocal and the next
      reduction into the same sweep — ONE phi sweep per half-step instead
      of _train_2a's two, on half-width words: ~4x less HBM traffic on the
      dominant stage, with the kernel's hand-built 3-pass bf16-split dots
      (single-pass MXU streams) in place of the ambient 6-pass "highest"
      wall.
    - the column scale is SHARD-LOCAL (each shard quantizes its own rows:
      phi_bl ~ Q_l diag(scale_l)), applied at the m-sized boundaries —
      t_q = scale_l * t into the sweep, scale_l * s_q out — so the psum'd
      running s stays in TRUE scale across shards; the single-chip path
      folds its one global scale into lam instead (same algebra, error
      <= colmax * 2^-16 per element either way).
    - the replicated p-row Um block stays f32: it is O(p*m) against the
      shard's O(nb_local*m), and its matvecs are m-sized work.
    On non-TPU meshes (forced via NLE_SINKHORN_INT16=on) the sweeps run
    sinkhorn_halfstep_split_xla — the plain-XLA twin of the kernel's split
    arithmetic — so CPU-mesh tests certify the quantized trajectory's
    error class off-chip."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        TILE_N,
        _packed_chunk,
        quantize_int16,
        quantize_pack_int16,
        sinkhorn_halfstep_manual,
        sinkhorn_halfstep_split_xla,
    )

    phi_bl = (affinity_matmul(fa, fb_local, Uinv, sw, pw,
                              use_pallas=on_tpu)
              * mask_local[:, None])
    nb_local = phi_bl.shape[0]
    dt = fa.dtype

    if on_tpu:
        # Kernel layout: rows to a 2*tile multiple (pair-packing halves
        # them), cols to the 128-lane alignment. split_row_pad IS the
        # sizing rule (VMEM-budget tile shrink included) — re-deriving it
        # here would drift if the kernel's budget is retuned.
        from nle_tpu.ops.pallas.sinkhorn_kernel import split_row_pad

        mpad = -(-mb // 128) * 128
        npad, tile = split_row_pad(nb_local, mb)
        phi_q = jnp.pad(phi_bl, ((0, npad - nb_local), (0, mpad - mb)))
        q32, scale, _ = quantize_pack_int16(phi_q)
        crush_local = phi_q, scale
        chunk_q = _packed_chunk(tile, npad // 2, mpad)

        def local_halfstep(tq):
            x, s_q = sinkhorn_halfstep_manual(q32, tq, eps, chunk=chunk_q)
            return x[:nb_local], s_q
    else:
        mpad = mb
        qf, scale, _ = quantize_int16(phi_bl)
        crush_local = phi_bl, scale
        qi = qf.astype(jnp.int32)

        def local_halfstep(tq):
            return sinkhorn_halfstep_split_xla(qi, tq, eps)

    # Shard-local crush counts, psum'd to the GLOBAL crush fraction — the
    # carrier validity statistic (same semantics as the single-chip
    # carrier_crush_frac; shard-LOCAL scales, so the count uses each
    # shard's own scale exactly as its carrier does).
    from nle_tpu.ops.pallas.sinkhorn_kernel import crush_counts

    num_l, den_l = crush_counts(*crush_local)
    crush = (jax.lax.psum(num_l, "pixel")
             / jnp.maximum(jax.lax.psum(den_l, "pixel"), 1.0))

    def pad_m(v):
        return jnp.pad(v, (0, mpad - mb)) if mpad != mb else v

    def halfstep(s):
        t = lam_m * s
        xp = safe_reciprocal(Um @ t, eps)
        x_bl, s_q = local_halfstep(scale * pad_m(t))
        s_new = Um.T @ xp + jax.lax.psum((scale * s_q)[:mb], "pixel")
        return xp, x_bl, s_new

    data_varying = lambda x: jax.lax.pcast(x, ("data",), to="varying")
    ones_p = data_varying(jnp.ones((p,), dt))
    # s0 = phi^T @ ones EXACTLY (f32, pre-quantization) — the single-chip
    # fused path computes s0 from the f32 phi too. As there, the local
    # term is the COLUMN SUM (masked rows are exact zeros) so XLA fuses
    # it with the quantizer's abs-max reduce into one phi read.
    s0 = Um.T @ ones_p + jax.lax.psum(jnp.sum(phi_bl, axis=0), "pixel")

    init = (data_varying(jnp.zeros((p,), dt)),
            jnp.zeros_like(mask_local), s0)
    if n_iter == 0:
        rp = ones_p
        cp, cbl = init[:2]
    else:
        # Only s carries between iterations: run n_iter-1 fused
        # iterations, then unroll the final one to capture (c, r) from
        # its two half-steps (same structure as _train_2a_streaming).
        def full_body(_, st):
            cp, cbl, s = st
            cp, cbl, s = halfstep(s)
            _, _, s = halfstep(s)
            return cp, cbl, s

        cp, cbl, s = jax.lax.fori_loop(0, n_iter - 1, full_body, init)
        cp, cbl, s = halfstep(s)
        rp, _rbl, _ = halfstep(s)

    cphiu = jnp.where(jnp.arange(p) >= m_dyn, cp, 0.0)[:, None] * Um
    cphib_l = cbl[:, None] * phi_bl
    Sb = cphiu.T @ cphiu + jax.lax.psum(_local_gram(cphib_l, gram_mode),
                                        "pixel")
    return rp, cp, Sb, cphib_l, crush


def _train_2a_streaming(Um, lam_m, Uinv, m_dyn, fa, fb_local, mask_local, *,
                        p, mb, n_iter, eps, sw, pw, interpret):
    """Per-(batch element, pixel-shard) phi-FREE Nystrom + Sinkhorn body:
    the local rest-block rows of phi are recomputed from affinity tiles
    every half-step (ops/pallas/streaming_kernel.py), so no (nb_local, m)
    factor ever exists — per-shard memory is O(nb_local). Combined with the
    pixel mesh this scales capacity AND streaming sweep rate by the number
    of chips (the sweep is VPU-bound and embarrassingly row-parallel; only
    m-sized psums cross ICI). Shapes static in the rank bucket mb; the true
    m (traced m_dyn) only masks the Sb boundary, as in _train_2a."""
    Uinv32 = Uinv
    nb_local = fb_local.shape[0]

    if interpret:
        # Non-TPU (CPU-mesh tests): same association and reduction structure
        # as the Pallas kernels, via the tiled XLA affinity builder —
        # interpret-mode pallas under shard_map trips check_vma on the
        # replicated SMEM scalars.
        def stream_halfstep(u, unit_x=False):
            if unit_x:
                x_bl = mask_local
            else:
                w = affinity_matmul_xla(fa, fb_local, u[:, None], sw, pw)[:, 0]
                x_bl = safe_reciprocal(w, eps) * mask_local
            ap = affinity_matmul_xla(fb_local, fa, x_bl[:, None], sw, pw)[:, 0]
            return x_bl, ap

        def stream_gram(cbl):
            cphi = cbl[:, None] * affinity_matmul_xla(
                fa, fb_local, Uinv32, sw, pw)
            return cphi.T @ cphi

    else:
        from nle_tpu.ops.pallas.streaming_kernel import (
            gram_fits_vmem,
            pad_stream_operands,
            streaming_halfstep as _halfstep_dispatch,
            streaming_scaled_gram_pallas,
            streaming_scaled_gram_xla,
        )

        fa_rows, fb_cols, _ = pad_stream_operands(fa, fb_local)
        ppad = fa_rows.shape[1]   # stream_p_alignment rule
        qpad = fb_cols.shape[1]   # the helper's TILE_Q padding rule
        mpad = -(-mb // 128) * 128
        # The shard's own validity mask, not the helper's (global pad rows
        # inside this shard are marked invalid by mask_local).
        mask_pad = jnp.pad(mask_local, (0, qpad - nb_local))[None, :]

        def stream_halfstep(u, unit_x=False):
            u_pad = jnp.pad(u, (0, ppad - p))
            x_bl, ap = _halfstep_dispatch(
                fa_rows, fb_cols, mask_pad, u_pad, sw, pw, eps,
                unit_x=unit_x)
            return x_bl[:nb_local], ap[:p]

        def stream_gram(cbl):
            c_row = jnp.pad(cbl, (0, qpad - nb_local))[None, :]
            if gram_fits_vmem(p, mb):
                uinv_pad = jnp.pad(Uinv32, ((0, ppad - p), (0, mpad - mb)))
                return streaming_scaled_gram_pallas(
                    fa_rows, fb_cols, c_row, uinv_pad, sw, pw)[:mb, :mb]
            return streaming_scaled_gram_xla(
                fa, fb_cols, c_row, Uinv32, sw, pw)

    def halfstep(s):
        t = lam_m * s
        u = Uinv32 @ t
        xp = safe_reciprocal(Um @ t, eps)
        x_bl, ap = stream_halfstep(u)
        s_new = Um.T @ xp + jax.lax.psum(Uinv32.T @ ap, "pixel")
        return xp, x_bl, s_new

    # s0 = phi^T @ ones
    _, ap0 = stream_halfstep(jnp.zeros((p,), fa.dtype), unit_x=True)
    s0 = jnp.sum(Um, axis=0) + jax.lax.psum(Uinv32.T @ ap0, "pixel")

    data_varying = lambda x: jax.lax.pcast(x, ("data",), to="varying")
    dt = fa.dtype
    sel_u = jnp.arange(p) >= m_dyn   # rows below the balanced-block boundary
    init = (
        data_varying(jnp.zeros((p,), dt)),
        jnp.zeros_like(mask_local),
        s0,
    )

    if n_iter == 0:
        # Match the dense body's init state (r = ones, c = zeros, Sb = 0).
        rp = data_varying(jnp.ones((p,), dt))
        cp, cbl = init[:2]
        cphiu = jnp.where(sel_u, cp, 0.0)[:, None] * Um
        Sb = cphiu.T @ cphiu + jax.lax.psum(stream_gram(cbl), "pixel")
        return rp, cp, Sb, cbl

    # Both r and c are needed at the end but only s carries between
    # iterations: run n_iter-1 fused iterations, then unroll the final one
    # to capture (c, r) from its two half-steps.
    def full_body(_, state):
        cp, cbl, s = state
        cp, cbl, s = halfstep(s)
        _, _, s = halfstep(s)
        return cp, cbl, s

    cp, cbl, s = jax.lax.fori_loop(0, n_iter - 1, full_body, init)
    cp, cbl, s = halfstep(s)
    rp, rbl, s = halfstep(s)

    cphiu = jnp.where(sel_u, cp, 0.0)[:, None] * Um
    Sb = cphiu.T @ cphiu + jax.lax.psum(stream_gram(cbl), "pixel")
    return rp, cp, Sb, cbl


def element_host_chain(rp64, cp64, sb, Um64, lam64, m: int, mb: int,
                       k: int, eps: float, dtype):
    """Per-element host-f64 orthogonalization chain + sampled-row V
    assembly, shared by the single-process mesh trainer and the multihost
    trainer (parallel/distributed.py) — ONE definition so a numerics fix
    here cannot silently diverge between the two (an inline duplicate of
    this chain once dropped the NLE_Q_SOLVER override; see
    host_orthogonalize's history note). Returns (va_np, Sq, GrT, top):
    top is the (p, k) sampled-pixel rows of V."""
    from nle_tpu.ops.pipeline import host_orthogonalize

    p = Um64.shape[0]
    va_np, Sq = host_orthogonalize(
        np.stack([rp64, cp64]), sb, Um64, lam64, m, mb, k, eps)
    GrT = va_np[:m, k:]
    Vu = (cp64[m:p, None] * Um64[m:]) @ GrT
    top = np.concatenate([va_np[:m, :k], Vu], axis=0).astype(np.dtype(dtype))
    return va_np, Sq, GrT, top


def factored_from_pieces(channel, grid, hx, hy, cp64, cbl, top, W, Sq):
    """Assemble a V-free FactoredFilter from trainer pieces (shared by the
    mesh and multihost factored paths). Keeps the u8 pack rule: an 8-bit
    training channel stays uint8 in y_train (4x smaller checkpoints,
    models/factored.py)."""
    from nle_tpu.models.factored import FactoredFilter
    from nle_tpu.ops.pipeline import pack_channel

    y_train, _ = pack_channel(channel, grid.perm)
    c_full = np.concatenate([cp64.astype(np.float32),
                             np.asarray(cbl, np.float32)])
    return FactoredFilter(
        y_train=y_train, c=jnp.asarray(c_full),
        v_head=jnp.asarray(top, jnp.float32),
        w=jnp.asarray(np.asarray(W, np.float32)),
        eigvals=jnp.asarray(np.asarray(Sq, np.float32)),
        nrows=grid.nrows, ncols=grid.ncols, hx=float(hx), hy=float(hy),
        perm=grid.perm)


def train_filter_sharded(
    channels,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int,
    n_eig_vectors: int,
    mesh: Mesh,
    *,
    eps: float | None = None,
    dtype=jnp.float32,
    streaming: bool = False,
    factored: bool = False,
    stage1: str = "host64",
):
    """Train filters for a batch of channels (B, H, W) over the mesh.

    Returns (V (B, N, k) pixel-order, S (B, k)). Any B works (each bucket
    group is padded up to the 'data' axis size by repeating its last
    element; the duplicate work is idempotent). Batch elements are
    processed in groups sharing a kept-rank BUCKET mb = bucket_m(m, p)
    (shapes are static per compile; the per-element true m is traced — see
    ops/pipeline.py m-bucketing).

    streaming=True uses the phi-free stage 2 per shard (affinity tiles
    recomputed every sweep): per-shard memory drops from O(nb_local * m) to
    O(nb_local), so capacity AND the VPU-bound sweep rate scale with the
    pixel-axis size — the multi-chip route past the single-chip ~50 MP.

    factored=True (requires streaming=True, float32) returns a list of
    V-FREE FactoredFilters instead of (V, S) — each keeps its OWN
    k = min(n_eig_vectors, m_i) (no batch-wide k truncation): the (B, N, k) eigenvector build is
    skipped entirely — the trainer already holds every piece a factored
    filter needs (models/factored.py) — taking mesh capacity past the
    stored-V ceiling. Apply with apply_filter_factored_sharded (or the
    filters' own single-chip apply).
    """
    if factored and not streaming:
        raise ValueError(
            "factored=True requires streaming=True (the dense path's "
            "sharded factor is the scaled phi, not the c vector).")
    if factored and jnp.dtype(dtype) != jnp.float32:
        raise ValueError(
            "factored=True is float32-only (models/factored.py); got "
            f"dtype {jnp.dtype(dtype).name}.")
    if streaming and jnp.dtype(dtype) != jnp.float32:
        # Same contract as the single-chip twin (ops/pipeline.py): the
        # streaming Pallas kernels compute in f32.
        raise ValueError(
            "streaming stage 2 is float32-only (the Pallas kernels compute "
            f"in f32); got dtype {jnp.dtype(dtype).name}.")
    channels = np.asarray(channels)
    b, nrows, ncols = channels.shape
    grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)
    p = grid.n_samples
    n = grid.n_pixels
    nb = n - p
    n_pixel = mesh.shape["pixel"]
    nb_pad = -(-nb // n_pixel) * n_pixel
    if eps is None:
        eps = default_eps(dtype)
    eps = float(eps)

    flat = channels.reshape(b, n)[:, grid.perm].astype(np.dtype(dtype))
    sw, pw = bandwidth_weights(hx, hy, dtype)

    # Pixel-sharded inputs are placed DIRECTLY onto their mesh shards
    # (device_put splits the host array per shard; the sharded feature
    # build below keeps every derived tensor on its shard): the batch's
    # (B, nb_pad, 3) features must never materialize on one default
    # device, or capacity would cap at a single chip's HBM and defeat the
    # pixel mesh. Coordinate planes are cached per (grid, mesh).
    dt = np.dtype(dtype)
    rr_a = (grid.perm[:p] // ncols).astype(dt)
    cc_a = (grid.perm[:p] % ncols).astype(dt)
    fa_np = np.stack(
        [np.broadcast_to(rr_a, (b, p)), np.broadcast_to(cc_a, (b, p)),
         flat[:, :p]], axis=-1)
    flat_rest = np.zeros((b, nb_pad), dt)
    flat_rest[:, :nb] = flat[:, p:]
    rr_rest, cc_rest = _coord_rest_arrays(grid, mesh, dtype, nb_pad)

    # Stage 1 (host, float64): Ka eigensystem per batch element — the
    # chaos-sensitive eigenbasis must be chosen at f64 (see ops/pipeline.py).
    # Serial on the single host core; stage1="topk" swaps in the doubling
    # ARPACK solver (wins only in truncating regimes, see ka_eigh_topk_host64).
    from nle_tpu.ops.pipeline import (
        bucket_m,
        ka_eigh_host64,
        ka_eigh_topk_host64,
    )

    from nle_tpu.utils.logging import logger, warn_truncation

    s1_fn = ka_eigh_topk_host64 if stage1 == "topk" else ka_eigh_host64
    stage1 = [
        s1_fn(
            channels[i][grid.sel_rows, grid.sel_cols],
            grid.sel_rows, grid.sel_cols, hx, hy, eps,
        )
        for i in range(b)
    ]
    ms = np.array([s[1].shape[0] for s in stage1])
    for m in ms:
        warn_truncation(p, int(m), eps)
    mbs = np.array([bucket_m(int(m), p) for m in ms])

    k_out = min(n_eig_vectors, int(ms.min()))
    if k_out < n_eig_vectors and not factored:
        # (factored filters each keep their own k = min(n_eig, m) — no
        # batch-wide truncation happens there)
        logger.warning(
            "Sharded batch: element with kept rank %d limits every "
            "element's eigenvector count to %d (requested %d).",
            int(ms.min()), k_out, n_eig_vectors)
    if factored:
        filters: list = [None] * b
        V_out = np.zeros((0,))    # unused in factored mode
        S_out = np.zeros((0,))
    else:
        V_out = np.zeros((b, n, k_out), dtype=np.dtype(dtype))
        S_out = np.zeros((b, k_out), dtype=np.dtype(dtype))

    # The per-element chain runs through element_host_chain (one shared
    # definition with the multihost trainer; it wraps the ONE
    # host_orthogonalize in ops/pipeline.py, which honors NLE_Q_SOLVER).
    from nle_tpu.ops.pipeline import submit_sb_fetch

    n_data = mesh.shape["data"]
    for mb in np.unique(mbs):
        idx = np.nonzero(mbs == mb)[0]
        mb = int(mb)
        # shard_map requires the batch to divide the 'data' axis: pad the
        # group by repeating its last element (duplicate host-chain work is
        # idempotent — V_out/S_out writes for a repeated index rewrite the
        # same values).
        short = (-len(idx)) % n_data
        if short:
            idx = np.concatenate([idx, np.repeat(idx[-1:], short)])

        sh_data = NamedSharding(mesh, P("data"))

        def padded(j, arr1d=False):
            """Stack a group's stage-1 piece zero-padded to the bucket,
            placed data-sharded (replicated over 'pixel') on the mesh."""
            outs = []
            for i in idx:
                a = stage1[i][j]
                pad = ((0, mb - a.shape[-1]),) if arr1d else (
                    (0, 0), (0, mb - a.shape[-1]))
                outs.append(np.pad(a, pad))
            return jax.device_put(
                np.stack(outs).astype(np.dtype(dtype)), sh_data)

        Um = padded(0)
        lam_m = padded(1, arr1d=True)
        Uinv = padded(2)
        m_arr = jax.device_put(ms[idx].astype(np.int32), sh_data)
        fa_g = jax.device_put(fa_np[idx], sh_data)
        yb_g = jax.device_put(flat_rest[idx],
                              NamedSharding(mesh, P("data", "pixel")))
        fb_g, mask_g = _build_feats_step(mesh, nb, nb_pad)(
            yb_g, rr_rest, cc_rest)
        # Decide by the MESH devices' platform, not the process default
        # backend: under the pinned axon platform a virtual CPU mesh still
        # sees default_backend() == "tpu".
        on_tpu = mesh.devices.flat[0].platform == "tpu"
        interpret = not on_tpu
        q_step = False
        if streaming:
            step = _sharded_2a_step_streaming(
                mesh, p, mb, n_sinkhorn_iter, eps, interpret)
        elif _sharded_int16(on_tpu):
            step = _sharded_2a_step_q(mesh, p, mb, n_sinkhorn_iter, eps,
                                      on_tpu)
            q_step = True
        else:
            step = _sharded_2a_step(mesh, p, mb, n_sinkhorn_iter, eps, on_tpu)
        with jax.default_matmul_precision("highest"):
            if q_step:
                rp, cp, Sb, cphib, crush = step(
                    Um, lam_m, Uinv, m_arr, fa_g, fb_g, mask_g, sw, pw
                )
            else:
                rp, cp, Sb, cphib = step(
                    Um, lam_m, Uinv, m_arr, fa_g, fb_g, mask_g, sw, pw
                )
        if q_step and _sharded_guard_trips(crush):
            # Same int16-carrier validity guard as the single-chip path
            # (ops/pipeline.py check_carrier_guard, VERDICT r4 #2): any
            # element of this group over the crush threshold retrains the
            # GROUP through the f32 carrier (warn-and-continue; groups are
            # small and out-of-domain inputs rare). Costs one tiny (B,)
            # fetch per int16 group, submitted before the rp/cp fetches
            # would have been anyway.
            step = _sharded_2a_step(mesh, p, mb, n_sinkhorn_iter, eps,
                                    on_tpu)
            with jax.default_matmul_precision("highest"):
                rp, cp, Sb, cphib = step(
                    Um, lam_m, Uinv, m_arr, fa_g, fb_g, mask_g, sw, pw
                )
        # Submit the lazy group Sb fetch BEFORE the blocking rp/cp fetches
        # so it rides the tunnel concurrently with them (single-chip
        # protocol, ops/pipeline.py submit_sb_fetch — measured Sb-in-hand
        # win); host_orthogonalize resolves it only after the first
        # element's eig(Wa)+E, hiding the (group, mb, mb) transfer under
        # host work.
        sb_group = submit_sb_fetch(Sb)
        rp64 = np.asarray(fetch(rp), np.float64)
        cp64 = np.asarray(fetch(cp), np.float64)
        grts = []
        fact_pieces: dict = {}
        for j, i in enumerate(idx):
            m = int(ms[i])
            k = min(n_eig_vectors, m)
            va_np, Sq, GrT, top = element_host_chain(
                rp64[j], cp64[j], (lambda jj=j: sb_group()[jj]),
                stage1[i][0], stage1[i][1], m, mb, k, eps, dtype)
            if factored:
                fact_pieces[j] = (top, (stage1[i][2] @ GrT).astype(np.float32),
                                  Sq.astype(np.float32))
                continue
            grts.append(va_np[:, k:k + k_out])   # (mb, k_out), zero past m
            V_out[i, grid.perm[:p], :] = top[:, :k_out]  # k >= k_out
            S_out[i] = Sq[:k_out].astype(np.dtype(dtype))
        if factored:
            # cphib holds the sharded c vector; every other piece is on the
            # host already — no (B, N, k) eigenvector build at all.
            cbl_np = fetch(cphib)[:, :nb]
            for j, i in enumerate(idx):
                if filters[i] is not None:
                    continue   # padded duplicate of the group's last element
                v_head, W, Sq32 = fact_pieces[j]
                filters[i] = factored_from_pieces(
                    channels[i], grid, hx, hy, cp64[j], cbl_np[j],
                    v_head, W, Sq32)
            continue
        with jax.default_matmul_precision("highest"):
            grt_dev = jnp.asarray(np.stack(grts), dtype)
            if streaming:
                # cphib holds the sharded c vector; Vb is one fused
                # affinity matmul per shard with the small (p, k) factor.
                B = jnp.einsum("bpm,bmk->bpk", Uinv, grt_dev)
                step2b = _sharded_2b_streaming(mesh, interpret)
                Vb = step2b(fa_g, fb_g, cphib, B, sw, pw)
            else:
                from nle_tpu.ops.precision import (
                    dot_general_3pass,
                    stage2_dots,
                )

                # The stage-2b eigenvector tail is the 'v' split site.
                # Under the default auto this XLA site stays "highest"
                # (auto splits IN-KERNEL sites only after the r4
                # taj-denoise reversion — ops/precision.py); the 3-pass
                # branch engages only under a forced NLE_STAGE2_DOTS=high,
                # kept for layout A/Bs. Batched dims (b), contract m.
                if stage2_dots("v", on_tpu=on_tpu) == "high":
                    Vb = dot_general_3pass(
                        cphib, grt_dev,
                        (((2,), (1,)), ((0,), (0,))))
                else:
                    Vb = jnp.einsum("bnm,bmk->bnk", cphib, grt_dev)
        Vb_np = fetch(Vb)[:, :nb, :]
        for j, i in enumerate(idx):
            V_out[i, grid.perm[p:], :] = Vb_np[j]
    if factored:
        return filters
    return jnp.asarray(V_out), jnp.asarray(S_out)


def apply_filter_sharded(eigvecs, f_eigvals, channel, mesh: Mesh):
    """V diag(f(S)) V^T c with V rows and c sharded over 'pixel'."""
    n, k = eigvecs.shape
    n_pixel = mesh.shape["pixel"]
    n_pad = -(-n // n_pixel) * n_pixel
    V = jnp.pad(eigvecs, ((0, n_pad - n), (0, 0)))
    c = jnp.pad(channel.reshape(-1).astype(eigvecs.dtype), (0, n_pad - n))

    out = _sharded_apply(mesh)(V, c, f_eigvals.astype(eigvecs.dtype))
    return out[:n].reshape(channel.shape)


@functools.lru_cache(maxsize=32)
def _factored_proj_step(mesh: Mesh, interpret: bool):
    """proj_rest (k,) = sum over pixel shards of W^T (K_AB @ (c*y))_local."""
    def body(fb_l, cy_l, fa, w, sw, pw):
        if interpret:
            ap = affinity_matmul_xla(fb_l, fa, cy_l[:, None], sw, pw)[:, 0]
        else:
            from nle_tpu.ops.pallas.streaming_kernel import (
                pad_stream_operands,
                streaming_ap_pallas,
            )

            fa_rows, fb_cols, _ = pad_stream_operands(fa, fb_l)
            qpad = fb_cols.shape[1]
            cy_row = jnp.pad(cy_l, (0, qpad - cy_l.shape[0]))[None, :]
            ap = streaming_ap_pallas(fa_rows, fb_cols, cy_row, sw,
                                     pw)[0, :fa.shape[0]]
        return jax.lax.psum(w.T @ ap, "pixel")

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("pixel"), P("pixel"), P(), P(), P(), P()),
        out_specs=P(),
    ))


@functools.lru_cache(maxsize=32)
def _factored_tail_step(mesh: Mesh, interpret: bool):
    """out_local = c_local * (K_AB^T @ b)_local per pixel shard."""
    def body(fb_l, c_l, fa, b, sw, pw):
        if interpret:
            tail = affinity_matmul_xla(fa, fb_l, b[:, None], sw, pw)[:, 0]
        else:
            from nle_tpu.ops.pallas.streaming_kernel import (
                pad_stream_operands,
                streaming_atb_pallas,
            )

            fa_rows, fb_cols, _ = pad_stream_operands(fa, fb_l)
            ppad = fa_rows.shape[1]
            b_pad = jnp.pad(b, (0, ppad - b.shape[0]))
            tail = streaming_atb_pallas(fa_rows, fb_cols, b_pad, sw,
                                        pw)[0, :fb_l.shape[0]]
        return c_l * tail

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("pixel"), P("pixel"), P(), P(), P(), P()),
        out_specs=P("pixel"),
    ))


def apply_filter_factored_sharded(flt, channel, transformed_eigvals,
                                  mesh: Mesh):
    """V-free factored filter application with the rest block sharded over
    'pixel' (models/factored.py algebra; the multi-chip capacity route past
    the stored-V ceiling). channel is a pixel-order (H, W) host array;
    returns the filtered channel (host, pixel order).

    Two shard_map rounds with one k-sized psum between them: the projection
    proj = V_head^T y_head + sum_shards W^T (K_AB @ (c*y))_local, then the
    sharded tail out_local = c_local * (K_AB^T @ (W (fS*proj)))_local."""
    channel_np = np.asarray(channel)
    if channel_np.size != flt.n_pixels:
        raise ValueError(
            "Number of values in channel must match that of training image.")
    p = flt.v_head.shape[0]
    n = flt.n_pixels
    nb = n - p
    n_pixel = mesh.shape["pixel"]
    nb_pad = -(-max(nb, 1) // n_pixel) * n_pixel
    sh_pix = NamedSharding(mesh, P("pixel"))

    y = channel_np.reshape(-1).astype(np.float32)[flt.perm]
    state = getattr(flt, "_dev_sharded", None)
    if state is None or state[0] is not mesh:
        # Static per-filter operands built on the HOST and placed DIRECTLY
        # per shard (cached on the filter like _device_state): the (N, 3)
        # feature tensor must never materialize on one default device, or
        # capacity would cap at a single chip's HBM and defeat the pixel
        # mesh this function exists for. flt.c is the one device-resident
        # piece — its rest block reshards device-to-device (the transient
        # (nb_pad,) pad on the default device is 4 B/px, not the ~40 B/px
        # the old feature build paid).
        dt = np.float32
        rr = (flt.perm // flt.ncols).astype(dt)
        cc = (flt.perm % flt.ncols).astype(dt)
        yt = np.asarray(flt.y_train, dt)   # host pack (uint8 or f32)
        fb_np = np.zeros((nb_pad, 3), dt)
        fb_np[:nb, 0] = rr[p:]
        fb_np[:nb, 1] = cc[p:]
        fb_np[:nb, 2] = yt[p:]
        fa = jnp.asarray(np.stack([rr[:p], cc[:p], yt[:p]], axis=-1))
        fb = jax.device_put(fb_np, NamedSharding(mesh, P("pixel", None)))
        c_rest = jax.device_put(jnp.pad(flt.c[p:], (0, nb_pad - nb)),
                                sh_pix)
        flt._dev_sharded = (mesh, fa, fb, c_rest)
    _, fa, fb, c_rest = flt._dev_sharded

    sw, pw = bandwidth_weights(flt.hx, flt.hy)
    interpret = mesh.devices.flat[0].platform != "tpu"

    y_rest_np = np.zeros((nb_pad,), np.float32)
    y_rest_np[:nb] = y[p:]
    y_rest = jax.device_put(y_rest_np, sh_pix)
    cy = c_rest * y_rest   # sharded elementwise: stays on its shards
    with jax.default_matmul_precision("highest"):
        proj_rest = _factored_proj_step(mesh, interpret)(
            fb, cy, fa, flt.w, sw, pw)
        fS = jnp.asarray(transformed_eigvals, jnp.float32)
        proj = flt.v_head.T @ jnp.asarray(y[:p]) + proj_rest
        t = fS * proj
        out_head = flt.v_head @ t
        b_vec = flt.w @ t
        out_rest = _factored_tail_step(mesh, interpret)(
            fb, c_rest, fa, b_vec, sw, pw)
    out = np.concatenate([fetch(out_head), fetch(out_rest)[:nb]])
    unpacked = np.empty_like(out)
    unpacked[flt.perm] = out
    return unpacked.reshape(channel_np.shape)
