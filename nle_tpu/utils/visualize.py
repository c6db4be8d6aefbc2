"""Debug visualization utilities (reference src/filter.cpp:34-40,82-92).

Headless replacements for the reference's imshow-based debugging:
`rescale_for_visualization` min-max rescales any real array to [0, 255];
`plot_sampled_points` marks the Nystrom sample grid on an image;
`eigvec_images` renders trained filter eigenvectors as images.
"""

from __future__ import annotations

import numpy as np

from nle_tpu.ops.sampling import sample_grid


def rescale_for_visualization(arr) -> np.ndarray:
    """(x - min) / (max - min) * 255 (src/filter.cpp:34-40), as uint8."""
    arr = np.asarray(arr, np.float64)
    lo = arr.min()
    rng = arr.max() - lo
    if rng == 0:
        rng = 1.0
    return np.clip(np.rint((arr - lo) / rng * 255.0), 0, 255).astype(np.uint8)


def plot_sampled_points(image_bgr_u8, n_row_samples: int, n_col_samples: int,
                        radius: int = 2, color=(255, 0, 0)) -> np.ndarray:
    """Draw the selected sample pixels as filled discs (src/filter.cpp:82-92).

    Returns a copy of the image with markers; pure NumPy (no GUI).
    """
    img = np.array(image_bgr_u8, copy=True)
    h, w = img.shape[:2]
    g = sample_grid(h, w, n_row_samples, n_col_samples)
    dy, dx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disc = (dy**2 + dx**2) <= radius**2
    offs = np.stack([dy[disc], dx[disc]], axis=1)
    rr = (g.sel_rows[:, None] + offs[None, :, 0]).clip(0, h - 1).reshape(-1)
    cc = (g.sel_cols[:, None] + offs[None, :, 1]).clip(0, w - 1).reshape(-1)
    img[rr, cc] = color
    return img


def eigvec_images(trained, V: np.ndarray | None = None) -> list[np.ndarray]:
    """Min-max-rescaled images of the filter eigenvectors (the reference's
    debug imshow of the first <= 5 eigenvectors, src/filter.cpp:504-511).

    Rows are brought to pixel order first — TrainedFilter stores them in
    packed [selected; rest] order. Pass V to reuse an already-fetched
    pixel-order eigenvector matrix: the device->host fetch of an (N, k)
    matrix is the expensive part on a tunnel-attached TPU, and callers that
    also print per-vector stats (cli/common.py) would otherwise pay it
    twice.
    """
    if V is None:
        V = trained.eigvecs_pixel_order()
    out = []
    for i in range(min(V.shape[1], 5)):
        out.append(
            rescale_for_visualization(V[:, i]).reshape(trained.nrows, trained.ncols)
        )
    return out
