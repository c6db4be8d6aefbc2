"""NLEFilter — the model layer: train once, edit many.

Mirrors the reference class contract (reference include/filter.hpp:35-54):
`train_for_enhancement` / `train_for_denoise` learn the global filter
eigensystem from one channel; `enhance` / `denoise` re-weight the eigen
detail layers. Beyond the reference, the trained filter is a serializable
pytree (`TrainedFilter.save/load`) so editing can run standalone — the
reference keeps m_eigvecs only in process memory.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nle_tpu.color.bilateral import bilateral_filter_u8
from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np
from nle_tpu.ops.pipeline import apply_filter, apply_filter_u8, train_filter
from nle_tpu.ops.transform import shrink_eigenvalues, transform_eigenvalues
from nle_tpu.utils.transfer import fetch


@dataclasses.dataclass
class TrainedFilter:
    """The learned global filter: top-k orthonormal eigenvectors and
    eigenvalues of the balanced affinity matrix W.

    `eigvecs` rows are in packed [selected; rest] order when `perm` is set
    (perm[i] = flat pixel index of packed row i); permuting rows to pixel
    order happens on the host at the edges — an (N, k) device scatter is far
    more expensive than the filter application itself. `perm=None` means
    rows are already in pixel order (the reference's m_eigvecs layout)."""

    eigvecs: jax.Array  # (N, k)
    eigvals: jax.Array  # (k,)
    nrows: int
    ncols: int
    perm: np.ndarray | None = None
    # Optional (packed u8 host copy, device buffer) of the TRAINING channel:
    # the train->edit flow filters that very channel, so apply_u8 can reuse
    # the device buffer and skip one upload per edit (a full tunnel round
    # trip). Never serialized; purely a transfer cache.
    y_cache: tuple | None = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def n_pixels(self) -> int:
        return self.nrows * self.ncols

    def nbytes(self) -> int:
        """Accounted host+device residency of this filter (the serving
        store's byte-budget unit): the (N, k) eigvecs dominate at
        4k B/pixel; perm (host int64) and the training-channel transfer
        cache follow. Filters vary ~1000x in size (a 0.1 MP k=10 filter is
        ~4 MB; a 5 MP k=50 one ~1 GB), so a count-based residency bound
        alone cannot protect HBM."""
        n = 0
        for a in (self.eigvecs, self.eigvals):
            n += a.size * np.dtype(a.dtype).itemsize
        if self.perm is not None:
            n += self.perm.nbytes
        if self.y_cache is not None:
            packed_np, y_dev = self.y_cache
            n += packed_np.nbytes
            n += y_dev.size * np.dtype(y_dev.dtype).itemsize
        return int(n)

    def eigvecs_pixel_order(self) -> np.ndarray:
        """Eigenvectors with rows in flat pixel order (host array)."""
        V = fetch(self.eigvecs)
        if self.perm is None:
            return V
        out = np.empty_like(V)
        out[self.perm] = V
        return out

    def save(self, path: str) -> None:
        arrs = dict(
            eigvecs=fetch(self.eigvecs),
            eigvals=np.asarray(self.eigvals),
            shape=np.array([self.nrows, self.ncols]),
        )
        if self.perm is not None:
            arrs["perm"] = self.perm
        np.savez_compressed(path, **arrs)

    @classmethod
    def _from_arrays(cls, z) -> "TrainedFilter":
        """Build from a mapping of host arrays (device uploads happen
        here)."""
        return cls(
            eigvecs=jnp.asarray(z["eigvecs"]),
            eigvals=jnp.asarray(z["eigvals"]),
            nrows=int(z["shape"][0]),
            ncols=int(z["shape"][1]),
            perm=z["perm"] if "perm" in z else None,
        )

    @classmethod
    def load(cls, path: str) -> "TrainedFilter":
        return cls._from_arrays(_load_npz_host(_resolve_npz_path(path)))


def _resolve_npz_path(path: str) -> str:
    """np.savez_compressed appends ".npz" when missing — mirror that on
    load so save(p) / load(p) round-trips for any p."""
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        return path + ".npz"
    return path


def _load_npz_host(probe: str) -> dict:
    """Fully decompress an npz to plain host arrays (pure disk/CPU work)."""
    with np.load(probe) as z:
        return {k: z[k] for k in z.files}


def load_filter_host(path: str) -> dict:
    """Disk half of load_filter: decompress a saved filter to HOST arrays
    only, no device traffic. Callers that serialize device work (the
    serving filter store's device lock) do this OUTSIDE the lock — seconds
    of zlib for a megapixel filter — and pay only the upload inside it via
    filter_from_host."""
    return _load_npz_host(_resolve_npz_path(path))


def filter_from_host(arrays: dict):
    """Device half of load_filter: upload host arrays from
    load_filter_host into a TrainedFilter or FactoredFilter."""
    if "factored" in arrays:
        from nle_tpu.models.factored import FactoredFilter

        return FactoredFilter._from_arrays(arrays)
    return TrainedFilter._from_arrays(arrays)


def load_filter(path: str):
    """Load a saved filter of either kind: TrainedFilter (.npz with
    eigvecs) or the V-free FactoredFilter (marked with factored=True)."""
    return filter_from_host(load_filter_host(path))


def _check_image(image, n_pixels):
    image = np.asarray(image)
    if image.ndim != 3 or image.shape[2] != 3:
        # Reference guard text (src/filter.cpp:414-416).
        raise ValueError("Can only enhance RGB image.")
    if image.shape[0] * image.shape[1] != n_pixels:
        raise ValueError(
            "Cannot apply filter on image with different size from the image "
            "filter was trained on."
        )
    return image


class NLEFilter:
    """Train-and-edit convenience wrapper around the functional pipeline."""

    def __init__(self, trained: TrainedFilter | None = None, **train_kwargs):
        self._trained = trained
        self._train_kwargs = train_kwargs  # eps/dtype/use_pallas overrides
        self._lab_cache: tuple[np.ndarray, np.ndarray] | None = None
        # Adopt the training-channel device buffer when the TrainedFilter
        # carries one (pipelined trainer, models/batch.py): edits of the
        # training image skip their channel upload.
        self._packed_y_cache: tuple[np.ndarray, jax.Array] | None = (
            getattr(trained, "y_cache", None))

    def _to_lab(self, image: np.ndarray) -> np.ndarray:
        """BGR->Lab with a one-entry cache: the train->edit flow converts
        the same image twice (reference CLI semantics). The cache keys on a
        private SNAPSHOT of the pixels, never the caller's array object —
        comparing against the argument itself would be vacuously equal after
        an in-place mutation (img[:] = ...) and silently return the stale
        Lab. The snapshot copy costs one image-sized memcpy per cache miss;
        re-validation is a memcmp-speed array_equal."""
        image = np.asarray(image)
        if self._lab_cache is not None:
            cached_img, cached_lab = self._lab_cache
            if (
                cached_img.shape == image.shape
                and cached_img.dtype == image.dtype
                and np.array_equal(cached_img, image)
            ):
                return cached_lab
        lab = bgr_to_lab_u8_np(image)
        self._lab_cache = (image.copy(), lab)
        return lab

    def seed_lab_cache(self, image_bgr_u8, lab) -> None:
        """Pre-populate the BGR->Lab cache with a conversion the caller
        already computed (the pipelined batch CLI converts every image
        during training prep; recomputing it per edit would double the
        single host core's LUT work). Unlike _to_lab's own snapshot, no
        defensive copy is taken — the caller must not mutate the image
        afterwards."""
        self._lab_cache = (np.asarray(image_bgr_u8), np.asarray(lab))

    @property
    def trained(self) -> TrainedFilter:
        if self._trained is None:
            raise RuntimeError("Filter has not been trained.")
        return self._trained

    # -- training ---------------------------------------------------------

    def _train(self, channel, n_row_samples, n_col_samples, hx, hy,
               n_sinkhorn_iter, n_eigen_vectors, edit_weights=None):
        if self._train_kwargs.get("factored"):
            # V-free factored training (models/factored.py): the capacity
            # path — no (N, k) eigvec matrix is ever built.
            from nle_tpu.models.factored import train_filter_factored
            from nle_tpu.utils.logging import logger

            ignored = sorted(set(self._train_kwargs) - {"eps", "factored"})
            if ignored:
                logger.warning(
                    "factored training ignores option(s): %s (the factored "
                    "path is float32 Pallas-streaming only).",
                    ", ".join(ignored))
            kw = {k: v for k, v in self._train_kwargs.items() if k == "eps"}
            self._packed_y_cache = None
            self._trained = train_filter_factored(
                channel, n_row_samples, n_col_samples, hx, hy,
                n_sinkhorn_iter, n_eigen_vectors, **kw)
            return self._trained
        from nle_tpu.ops.sampling import sample_grid

        nrows, ncols = channel.shape
        grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)
        # Upload the packed channel once and keep the device buffer: the
        # train->edit flow filters the very same channel, so `apply` can
        # skip its upload (one tunnel round trip per edit).
        from nle_tpu.ops.pipeline import pack_channel

        packed_np, is_8bit = pack_channel(channel, grid.perm)
        y_dev = None
        self._packed_y_cache = None
        if is_8bit:
            y_dev = jnp.asarray(packed_np)
            self._packed_y_cache = (packed_np, y_dev)
        out = train_filter(
            channel, n_row_samples, n_col_samples, hx, hy,
            n_sinkhorn_iter, n_eigen_vectors, grid=grid, pixel_order=False,
            packed_y_dev=y_dev, edit_weights=edit_weights,
            **{k: v for k, v in self._train_kwargs.items()
               if k != "factored"},
        )
        V, S = out[:2]
        self._trained = TrainedFilter(V, S, nrows, ncols, perm=grid.perm,
                                      y_cache=self._packed_y_cache)
        if edit_weights is not None:
            return self._trained, out[2]
        return self._trained

    def train_for_enhancement(self, image_bgr_u8, n_row_samples, n_col_samples,
                              hx, hy, n_sinkhorn_iter=10, n_eigen_vectors=5):
        """Train on the 8-bit Lab luminance (src/filter.cpp:514-519).

        Color conversion runs on the host (bit-exact OpenCV LUT pipeline) —
        the image lives there anyway, and device round trips on a
        tunnel-attached TPU cost more than the LUT math.
        """
        lab = self._to_lab(np.asarray(image_bgr_u8))
        L = lab[..., 0].astype(np.float32)
        return self._train(L, n_row_samples, n_col_samples, hx, hy,
                           n_sinkhorn_iter, n_eigen_vectors)

    def train_and_enhance(self, image_bgr_u8, n_row_samples, n_col_samples,
                          hx, hy, n_sinkhorn_iter=10, n_eigen_vectors=5,
                          weights=()) -> np.ndarray:
        """train_for_enhancement + enhance in one flow, with the first
        edit's apply FUSED into the stage-2b device program (saves one
        dispatch round trip per frame — the enhance CLI / single-image
        serving path). Semantically identical to the two-call sequence
        (same jitted f(S) transform, same apply algebra; the filter state
        is left trained for further edits)."""
        image = np.asarray(image_bgr_u8)
        if image.ndim != 3 or image.shape[2] != 3:
            raise ValueError("Can only enhance RGB image.")
        if self._train_kwargs.get("factored"):
            # The factored path has no dense stage 2b; fall back to the
            # two-call sequence (train_filter_factored + streaming apply).
            self.train_for_enhancement(
                image, n_row_samples, n_col_samples, hx, hy,
                n_sinkhorn_iter, n_eigen_vectors)
            return self.enhance(image, weights)
        lab = self._to_lab(image)
        L = lab[..., 0].astype(np.float32)
        trained, edit_dev = self._train(
            L, n_row_samples, n_col_samples, hx, hy, n_sinkhorn_iter,
            n_eigen_vectors, edit_weights=list(weights))
        filtered = fetch(edit_dev)
        if trained.perm is not None:
            unpacked = np.empty_like(filtered)
            unpacked[trained.perm] = filtered
            filtered = unpacked
        out = lab.copy()
        out[..., 0] = filtered.reshape(lab.shape[:2])
        return lab_to_bgr_u8_np(out)

    def train_for_denoise(self, image_bgr_u8, n_row_samples, n_col_samples,
                          hx, hy, n_sinkhorn_iter, n_eigen_vectors,
                          sigma_color=10, sigma_space=10, *,
                          bilateral_L=None):
        """Train on the bilateral-prefiltered luminance (src/filter.cpp:521-538).

        bilateral_L: optional precomputed bilateral-filtered L plane (host
        u8 (H, W)) — skips the device bilateral (the pipelined batch CLI
        computes it once per frame), and is the substitution point the
        cross-implementation denoise parity gate uses to train with
        cv2.bilateralFilter's exact output (tests/test_denoise_parity.py)."""
        lab = self._to_lab(np.asarray(image_bgr_u8))
        if bilateral_L is None:
            bilateral_L = fetch(bilateral_filter_u8(
                jnp.asarray(lab[..., 0]), -1, sigma_color, sigma_space))
        return self._train(np.asarray(bilateral_L).astype(np.float32),
                           n_row_samples, n_col_samples, hx, hy,
                           n_sinkhorn_iter, n_eigen_vectors)

    # -- editing ----------------------------------------------------------

    def apply(self, channel, transformed_eigvals) -> np.ndarray:
        """V diag(f(S)) V^T c (src/filter.cpp:445-458). Returns the filtered
        channel in pixel order (host array)."""
        t = self.trained
        if not hasattr(t, "eigvecs"):      # FactoredFilter (V-free)
            return t.apply(channel, transformed_eigvals)
        channel_np = np.asarray(channel)
        if channel_np.size != t.eigvecs.shape[0]:
            raise ValueError(
                "Number of values in channel must match that of training image."
            )
        shape = channel_np.shape
        dtype = np.dtype(t.eigvecs.dtype)
        flat = channel_np.reshape(-1).astype(dtype)
        if t.perm is not None:
            flat = flat[t.perm]             # host gather into packed order
        out = fetch(
            apply_filter(t.eigvecs, jnp.asarray(transformed_eigvals), jnp.asarray(flat))
        )
        if t.perm is not None:
            unpacked = np.empty_like(out)
            unpacked[t.perm] = out          # host scatter back to pixel order
            out = unpacked
        return out.reshape(shape)

    def _apply_edit_u8(self, channels_u8: np.ndarray, scale_vals) -> np.ndarray:
        """Filter + clamp 8-bit channel(s); uint8 transfers both ways.
        channels_u8: (H, W) or (H, W, C) — multiple channels share one
        device dispatch."""
        t = self.trained
        if not hasattr(t, "eigvecs"):      # FactoredFilter (V-free)
            return t.apply_u8(channels_u8, scale_vals)
        shape = channels_u8.shape
        flat = channels_u8.reshape(t.eigvecs.shape[0], -1)
        if t.perm is not None:
            flat = flat[t.perm]
        # Train->edit flow: the single filtered channel is usually the very
        # channel training uploaded — reuse that device buffer.
        flat_dev = None
        if (self._packed_y_cache is not None and flat.shape[1] == 1
                and flat.dtype == np.uint8):
            cached_np, cached_dev = self._packed_y_cache
            if np.array_equal(flat[:, 0], cached_np):
                flat_dev = cached_dev
        if flat_dev is None:
            flat_dev = jnp.asarray(flat)
        out = fetch(
            apply_filter_u8(t.eigvecs, jnp.asarray(scale_vals), flat_dev)
        )
        if t.perm is not None:
            unpacked = np.empty_like(out)
            unpacked[t.perm] = out
            out = unpacked
        return out.reshape(shape)

    def enhance(self, image_bgr_u8, weights) -> np.ndarray:
        """Detail-layer recomposition on L only (src/filter.cpp:412-443)."""
        t = self.trained
        image = _check_image(image_bgr_u8, t.n_pixels)
        lab = self._to_lab(image)
        fS = transform_eigenvalues(t.eigvals, weights)
        out = lab.copy()
        out[..., 0] = self._apply_edit_u8(lab[..., 0], fS)
        return lab_to_bgr_u8_np(out)

    def denoise(self, image_bgr_u8, shrink_factor, sigma_color=10,
                sigma_space=10, *, bilateral_L=None) -> np.ndarray:
        """GLIDE-style global denoise (src/filter.cpp:349-410): bilateral on
        L, spectral filter with shrunk eigenvalues on the a/b chroma.

        bilateral_L: optional precomputed bilateral-filtered L plane (host
        u8 (H, W)) — the pipelined batch CLI already computed it as the
        training channel, so passing it here skips a second device
        bilateral dispatch + N-sized fetch per frame."""
        t = self.trained
        image = _check_image(image_bgr_u8, t.n_pixels)
        lab = self._to_lab(image)
        teig = shrink_eigenvalues(t.eigvals, shrink_factor)
        out = lab.copy()
        if bilateral_L is None:
            bilateral_L = fetch(bilateral_filter_u8(
                jnp.asarray(lab[..., 0]), -1, sigma_color, sigma_space))
        out[..., 0] = bilateral_L
        # Both chroma planes through one filter application
        # (src/filter.cpp:388-389), batched into a single dispatch.
        out[..., 1:] = self._apply_edit_u8(np.ascontiguousarray(lab[..., 1:]), teig)
        return lab_to_bgr_u8_np(out)
