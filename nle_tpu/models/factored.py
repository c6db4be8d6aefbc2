"""V-free FACTORED filter: the capacity path past the stored (N, k) V.

A trained nonlocal filter is V diag(S) V^T with V (N, k) — at k = 50 the
eigenvector matrix alone costs 200 B/pixel, which caps the phi-free
streaming trainer (~50 MP on a 16 GB v5e). But V's tail rows are
V_rest = c_rest * (K_AB^T @ W) with W = Uinv @ GrT (p, k): everything
needed to APPLY the filter is the (p, k) head/W pair, the Sinkhorn column
vector c, and the training features — ~17 B/pixel. This module regenerates
the tail rows from affinities at apply time (two streaming passes), lifting
single-chip train+edit capacity into the hundreds of megapixels.

No reference counterpart (the reference stores the dense N x k m_eigvecs,
include/filter.hpp:52-53, and is capped at ~0.1 MP by host RAM); this is
the factored-algebra extension of TrainedFilter (models/filter.py).
Numerics: the regenerated tail rows use the same affinity arithmetic as
the streaming trainer (association noise ~1e-7 relative; see
ops/pallas/streaming_kernel.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nle_tpu.config import default_eps
from nle_tpu.ops.affinity import bandwidth_weights
from nle_tpu.ops.pipeline import (
    _cast_channel,
    _grid_device_arrays,
    bucket_m,
    factored_apply,
    factored_filter_pieces,
    host_orthogonalize,
    ka_eigh_host64,
    pack_channel,
    pack_stage1,
    submit_sb_fetch,
    train_filter_stage2a_streaming,
)
from nle_tpu.ops.sampling import sample_grid
from nle_tpu.utils.logging import stage, warn_truncation
from nle_tpu.utils.transfer import fetch, transfer_pool


@dataclasses.dataclass
class FactoredFilter:
    """Apply-only factored filter state (packed [selected; rest] order)."""

    y_train: np.ndarray   # (N,) packed training channel (uint8 or f32)
    c: jax.Array          # (N,) Sinkhorn column vector, f32 device
    v_head: jax.Array     # (p, k) sampled-pixel rows of V
    w: jax.Array          # (p, k) tail generator Uinv @ GrT
    eigvals: jax.Array    # (k,)
    nrows: int
    ncols: int
    hx: float             # affinity bandwidths: the tail is regenerated
    hy: float             # from features, so they are part of the state
    perm: np.ndarray      # packed-order permutation
    # Device-resident (rr, cc, y_train) uploads, built lazily: stored ON
    # the filter so HBM frees when the filter is dropped (a module-level
    # cache pins ~1 GB per 64 MP filter past its lifetime).
    _dev: tuple | None = dataclasses.field(
        default=None, init=False, repr=False, compare=False)
    # Pixel-sharded analog for apply_filter_factored_sharded
    # (parallel/sharded.py): (mesh, fa, fb, c_rest), rebuilt if the mesh
    # changes.
    _dev_sharded: tuple | None = dataclasses.field(
        default=None, init=False, repr=False, compare=False)

    @property
    def n_pixels(self) -> int:
        return self.nrows * self.ncols

    def nbytes(self) -> int:
        """Accounted host+device residency (serving byte-budget unit).
        Includes the lazily-built `_dev` feature uploads (rr, cc, y_train
        as f32 — 12 B/pixel of HBM) whether or not they are built yet: the
        first apply builds them, so budgeting on the pre-build size would
        under-account every filter that actually serves traffic."""
        n = self.y_train.nbytes + self.perm.nbytes
        for a in (self.c, self.v_head, self.w, self.eigvals):
            n += a.size * np.dtype(a.dtype).itemsize
        n += 3 * self.n_pixels * 4   # _dev: rr, cc, y as f32
        return int(n)

    def _apply_packed(self, y_packed: jax.Array, f_eigvals) -> jax.Array:
        rr, cc, y_train = _device_state(self)
        p = self.v_head.shape[0]
        sw, pw = bandwidth_weights(self.hx, self.hy)
        interpret = jax.default_backend() != "tpu"
        return factored_apply(
            y_packed, y_train, rr, cc, self.c, self.v_head, self.w,
            jnp.asarray(f_eigvals, jnp.float32), sw, pw,
            p=p, interpret=interpret)

    def apply(self, channel, transformed_eigvals) -> np.ndarray:
        """V diag(f(S)) V^T c on a pixel-order channel (host array in/out,
        same contract as NLEFilter.apply / reference src/filter.cpp:445)."""
        channel_np = np.asarray(channel)
        if channel_np.size != self.n_pixels:
            raise ValueError(
                "Number of values in channel must match that of training "
                "image.")
        shape = channel_np.shape
        flat = channel_np.reshape(-1).astype(np.float32)[self.perm]
        out = fetch(self._apply_packed(jnp.asarray(flat),
                                       transformed_eigvals))
        unpacked = np.empty_like(out)
        unpacked[self.perm] = out
        return unpacked.reshape(shape)

    def apply_u8(self, channels_u8: np.ndarray, scale_vals) -> np.ndarray:
        """Filter + clamp 8-bit channel(s), pixel order in/out. (H, W) or
        (H, W, C).

        Small images batch all C channels through ONE pair of streaming
        passes as extra kernel rows (channel-major (C, N) on device — an
        (N, C) array would pad its minor dim to 128 lanes); the fixed
        dispatch + tunnel latency dominates there, so one pass-pair wins.
        At capacity sizes the measured reality is the reverse: the R-row
        kernels run slower per pass than R single-row passes on this
        hardware (8 MP, C=2: batched 1.39 s vs 2x0.52 s), so large images
        dispatch per channel. NLE_FACTORED_BATCH_PIXELS overrides the
        threshold."""
        import os

        shape = channels_u8.shape
        flat = channels_u8.reshape(self.n_pixels, -1)[self.perm]
        limit = int(os.environ.get("NLE_FACTORED_BATCH_PIXELS",
                                   str(2_000_000)))
        if flat.shape[1] > 1 and self.n_pixels > limit:
            # Dispatch every channel before fetching any: the applies
            # queue back-to-back on the jax stream while the (pool-
            # threaded) fetches overlap them — fetching channel j before
            # dispatching j+1 would idle the chip for a full transfer.
            devs = [
                _clip_u8_flat(self._apply_packed(
                    _cast_channel(jnp.asarray(flat[:, j]), jnp.float32),
                    scale_vals))
                for j in range(flat.shape[1])
            ]
            futs = [transfer_pool().submit(fetch, d) for d in devs]
            out_t = np.stack([f.result() for f in futs], axis=0)
        else:
            # Host-side transpose to channel-major (cheap memcpy), uploaded
            # FLAT and reshaped inside jit: a (C, N) u8 device array pads
            # its sublane dim C -> 32, so a direct upload would move 16x
            # the bytes over the tunnel.
            flat_t = np.ascontiguousarray(flat.T)
            y = _cast_rows(jnp.asarray(flat_t.reshape(-1)),
                           flat_t.shape[0])
            filt = self._apply_packed(y, scale_vals)
            if filt.ndim == 1:
                filt = filt[None, :]
            # Clip + flatten INSIDE jit: a (C, N) u8 device array pads its
            # sublane dim C -> 32 (16x the physical bytes), which the fetch
            # would then stream; the jitted 1-D output is compact.
            out_t = fetch(_clip_u8_flat(filt)).reshape(flat.shape[1], -1)
        unpacked = np.empty_like(flat)
        unpacked[self.perm] = out_t.T
        return unpacked.reshape(shape)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            y_train=self.y_train,
            c=fetch(self.c),
            v_head=np.asarray(self.v_head),
            w=np.asarray(self.w),
            eigvals=np.asarray(self.eigvals),
            shape=np.array([self.nrows, self.ncols]),
            bandwidths=np.array([self.hx, self.hy], np.float64),
            perm=self.perm,
            factored=np.array(True),
        )

    @classmethod
    def load(cls, path: str) -> "FactoredFilter":
        from nle_tpu.models.filter import _load_npz_host, _resolve_npz_path

        return cls._from_arrays(_load_npz_host(_resolve_npz_path(path)))

    @classmethod
    def _from_arrays(cls, z) -> "FactoredFilter":
        """Build from a mapping of host arrays (device uploads happen
        here)."""
        return cls(
            y_train=z["y_train"],
            c=jnp.asarray(z["c"]),
            v_head=jnp.asarray(z["v_head"]),
            w=jnp.asarray(z["w"]),
            eigvals=jnp.asarray(z["eigvals"]),
            nrows=int(z["shape"][0]),
            ncols=int(z["shape"][1]),
            hx=float(z["bandwidths"][0]),
            hy=float(z["bandwidths"][1]),
            perm=z["perm"],
        )


@jax.jit
def _clip_u8_flat(x):
    """Reference clamp epilogue (src/filter.cpp:434-436) + flatten, fused
    on device: the flat u8 output has no padded sublanes to transfer."""
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8).reshape(-1)


@functools.partial(jax.jit, static_argnames=("rows",))
def _cast_rows(y_flat, rows: int):
    """(rows*N,) u8 -> (rows, N) f32 on device (the flat upload dodges the
    sublane padding a small-leading-dim u8 array pays over the tunnel)."""
    return y_flat.reshape(rows, -1).astype(jnp.float32)


def _device_state(flt: FactoredFilter):
    """Lazily-built device uploads (packed coords + training channel):
    repeated applies re-use them (each tunnel transfer costs ~30 ms and the
    coords are 8 B/pixel); stored on the filter so they free with it."""
    if flt._dev is None:
        perm = jnp.asarray(flt.perm)
        rr = (perm // flt.ncols).astype(jnp.float32)
        cc = (perm % flt.ncols).astype(jnp.float32)
        y = _cast_channel(jnp.asarray(flt.y_train), jnp.float32)
        flt._dev = (rr, cc, y)
    return flt._dev


def train_filter_factored(
    channel,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int = 10,
    n_eig_vectors: int = 5,
    *,
    eps: float | None = None,
) -> FactoredFilter:
    """Train a V-free factored filter on one channel (H, W): the phi-free
    streaming stage 2 (Sinkhorn + Sb never materialize phi) followed by the
    host-f64 chain — stage 2b (the (N, k) V build) is SKIPPED entirely;
    only the (p, k) head pieces are computed. float32 only."""
    channel_np = np.asarray(channel)
    nrows, ncols = channel_np.shape
    if eps is None:
        eps = default_eps(jnp.float32)
    grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)
    p = grid.n_samples
    perm, rr, cc = _grid_device_arrays(grid, jnp.float32)
    sw, pw = bandwidth_weights(hx, hy)

    packed_np, is_8bit = pack_channel(channel_np, grid.perm)
    y = _cast_channel(jnp.asarray(packed_np), jnp.float32) if is_8bit \
        else jnp.asarray(packed_np.astype(np.float32))

    with stage("Computing kernel"):
        Um64, lam64, _ = ka_eigh_host64(
            channel_np[grid.sel_rows, grid.sel_cols].astype(np.float64),
            grid.sel_rows, grid.sel_cols, hx, hy, float(eps))
    m = lam64.shape[0]
    if m == 0:
        raise ValueError("Affinity matrix Ka has no eigenvalues above eps.")
    warn_truncation(p, m, float(eps))
    mb = bucket_m(m, p)
    stage1_dev = jnp.asarray(pack_stage1(Um64, lam64, mb=mb))
    interpret = jax.default_backend() != "tpu"
    with stage("Nystrom approximation + Sinkhorn"):
        rc_dev, sb_dev, c_full = train_filter_stage2a_streaming(
            y, rr, cc, stage1_dev, sw, pw,
            p=p, mb=mb, n_sinkhorn_iter=n_sinkhorn_iter, eps=float(eps),
            interpret=interpret)
        # Sb fetch first: rides the tunnel concurrently with the blocking
        # rc fetch (requests pipeline; rc latency unharmed — measured).
        sb_resolve = submit_sb_fetch(sb_dev)
        rc_np = np.asarray(rc_dev, np.float64)
    k = min(n_eig_vectors, m)
    with stage("Orthogonalize"):
        va_np, Sq = host_orthogonalize(rc_np, sb_resolve, Um64, lam64,
                                       m, mb, k, float(eps))
        va_grt = jnp.asarray(va_np, jnp.float32)
        V_head, W = factored_filter_pieces(stage1_dev, c_full, va_grt,
                                           p=p, mb=mb)
    return FactoredFilter(
        y_train=packed_np, c=c_full, v_head=V_head, w=W,
        eigvals=jnp.asarray(Sq, jnp.float32), nrows=nrows, ncols=ncols,
        hx=float(hx), hy=float(hy), perm=grid.perm)
