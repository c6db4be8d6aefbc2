"""Train once, edit many: the serialized-filter workflow.

The reference binary retrains the filter for every edit (train+apply in one
process, state only in memory — reference include/filter.hpp:52-53). Here
the trained eigensystem is a saved artifact: sweep edit weights, or serve
edits for a fixed image, at apply cost only (two skinny MXU matmuls).

    python examples/filter_reuse.py [--platform=cpu] <image> <outdir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nle_tpu.models.filter import NLEFilter, TrainedFilter
from nle_tpu.utils.imageio import imread_bgr, imwrite_bgr


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--platform=")]
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            # Must precede any backend-initializing jax call (same rule as
            # the CLIs, cli/common.py): lets the smoke tests run this
            # documented flow on cpu without touching the one chip.
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
    image_path = args[0] if len(args) > 0 else "/root/reference/data/flower-50.bmp"
    out_dir = args[1] if len(args) > 1 else "/tmp/nle_filter_reuse"
    os.makedirs(out_dir, exist_ok=True)
    image = imread_bgr(image_path)

    # Key the cached filter by the image content AND the training
    # hyperparameters — a filter trained on a different image or with
    # different params must not be silently applied (same-size images
    # would produce garbage edits; different sizes a ValueError; stale
    # params a silent wrong-bandwidth edit).
    import hashlib

    train_params = dict(n_row_samples=10, n_col_samples=20, hx=100, hy=30,
                        n_sinkhorn_iter=50, n_eigen_vectors=30)
    digest = hashlib.sha1(
        image.tobytes() + repr(sorted(train_params.items())).encode()
    ).hexdigest()[:12]
    filter_path = os.path.join(out_dir, f"filter-{digest}.npz")
    if os.path.exists(filter_path):
        flt = NLEFilter(trained=TrainedFilter.load(filter_path))
        print(f"loaded filter from {filter_path}")
    else:
        flt = NLEFilter()
        flt.train_for_enhancement(image, **train_params)
        flt.trained.save(filter_path)
        print(f"trained and saved filter to {filter_path}")

    # Weight sweep: each edit is just an apply.
    for name, weights in {
        "boost_detail": [2, 3, 4, 1],
        "flatten": [1, 0.5, 0.5, 1],
        "sharpen_mid": [1, 1, 3, 1],
    }.items():
        out = flt.enhance(image, weights)
        path = os.path.join(out_dir, f"{name}.png")
        imwrite_bgr(path, out)
        print("wrote", path)


if __name__ == "__main__":
    main()
